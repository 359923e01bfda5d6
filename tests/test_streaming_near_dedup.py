"""Streaming incremental near-dedup: near-duplicates are suppressed
across micro-batches through the signature store, unique docs survive."""

from __future__ import annotations

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")  # one word differs -> near-dup
UNIQUE = (
    "completely different content about spark shuffles partitions and "
    "broadcast joins running on a large cluster with many executors"
)


def test_near_dups_suppressed_across_batches(spark, tmp_path):
    from go_pulsar_elasticsearch_spark.streaming.near_dedup import (
        run_incremental_near_dedup,
    )

    src = str(tmp_path / "src")
    batches = (
        [(1, BASE)],
        [(2, NEAR), (3, UNIQUE)],   # 2 near-dups batch-1's doc 1
        [(4, UNIQUE + " extra"), (5, BASE)],  # 5 near-dups doc 1 again
    )
    for batch in batches:
        spark.createDataFrame(batch, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_incremental_near_dedup(
        stream,
        store_path=str(tmp_path / "store"),
        out_path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    kept = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # doc 1 kept; 2 and 5 are near/exact dups of it; 3 unique; 4 is a
    # near-dup of 3 (suffix only) -> suppressed against the store
    assert 1 in kept and 3 in kept
    assert 2 not in kept and 5 not in kept and 4 not in kept
    # the store holds signatures only for survivors
    store_docs = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "store"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert store_docs == kept


def test_replay_with_same_checkpoint_adds_nothing(spark, tmp_path):
    """Restarting the drained stream against the same checkpoint must
    not reprocess batches: output and store sizes stay fixed (the
    exactly-once posture of the reference's ack path, checkpoint-style)."""
    from go_pulsar_elasticsearch_spark.streaming.near_dedup import (
        run_incremental_near_dedup,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, BASE), (2, UNIQUE)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    def start():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_incremental_near_dedup(
            stream,
            store_path=str(tmp_path / "store"),
            out_path=str(tmp_path / "out"),
            checkpoint=str(tmp_path / "ckpt"),
        )

    q = start()
    q.awaitTermination()
    n1 = spark.read.parquet(str(tmp_path / "out")).count()
    q2 = start()  # same checkpoint: nothing new to process
    q2.awaitTermination()
    n2 = spark.read.parquet(str(tmp_path / "out")).count()
    assert n1 == n2 == 2


def test_partial_failure_replay_is_idempotent(spark, tmp_path):
    """Simulate the crash window: epoch 0 runs fully, then is REPLAYED
    (same epoch_id) as after a failure between the store and output
    writes.  The replay must not match docs against their own epoch-0
    signatures, and must leave output/store exactly as a single run."""
    from go_pulsar_elasticsearch_spark.streaming.near_dedup import dedup_batch

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    batch = spark.createDataFrame(
        [(1, BASE), (2, UNIQUE)], "doc_id long, text string"
    )
    dedup_batch(spark, batch, store, out, epoch_id=0)
    kept1 = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept1 == [1, 2]
    # replay the same epoch: store already holds epoch-0 sigs
    dedup_batch(spark, batch, store, out, epoch_id=0)
    kept2 = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept2 == [1, 2]  # nothing lost, nothing duplicated
    n_sigs = spark.read.parquet(store).count()
    dedup_batch(spark, batch, store, out, epoch_id=0)
    assert spark.read.parquet(store).count() == n_sigs  # store stable too
    # and a LATER epoch still dedupes against epoch 0 through the store
    batch2 = spark.createDataFrame([(9, NEAR)], "doc_id long, text string")
    dedup_batch(spark, batch2, store, out, epoch_id=1)
    kept3 = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept3 == [1, 2]  # 9 near-dups doc 1 -> suppressed
