"""Streaming state introspection via Spark 4's `statestore` data source:
the checkpoint's state store is readable as a DataFrame, so an operator
can audit exactly what a stateful query is carrying — the observability
story for the engine's watermark/state claims (SCALE.md streaming
posture) without attaching a debugger to the stream."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run_sum_query(spark, src, ckpt, name):
    stream = spark.readStream.schema("k long, v long").parquet(src)
    agg = stream.groupBy("k").agg(F.sum("v").alias("total"))
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def _read_state(spark, ckpt) -> dict:
    """One place that knows the state row layout (key.k -> value.sum)."""
    return {
        r["key"]["k"]: r["value"]["sum"]
        for r in spark.read.format("statestore").load(ckpt).collect()
    }


def test_state_store_matches_batch_aggregate(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    rows = [(i % 3, i) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, v long")
    df.coalesce(1).write.parquet(src)
    _run_sum_query(spark, src, ckpt, "state_t1")

    got = _read_state(spark, ckpt)
    want = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert got == want


def test_state_evolves_across_restarts(spark, tmp_path):
    """A second batch lands, the query restarts from the checkpoint, and
    the state store shows the UPDATED running totals — proving the
    checkpointed state, not a per-run artifact, is what the reader
    exposes."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(0, 10), (1, 20)], "k long, v long"
    ).coalesce(1).write.mode("append").parquet(src)
    _run_sum_query(spark, src, ckpt, "state_t2a")
    first = _read_state(spark, ckpt)
    assert first == {0: 10, 1: 20}

    spark.createDataFrame(
        [(0, 5), (2, 7)], "k long, v long"
    ).coalesce(1).write.mode("append").parquet(src)
    _run_sum_query(spark, src, ckpt, "state_t2b")
    second = _read_state(spark, ckpt)
    assert second == {0: 15, 1: 20, 2: 7}


def test_state_metadata_describes_the_operator(spark, tmp_path):
    """The companion `state-metadata` source names the stateful operator
    and its partition/batch ranges — what an operator checks before
    pointing the statestore reader at a specific store."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(0, 1), (1, 2)], "k long, v long"
    ).coalesce(1).write.parquet(src)
    _run_sum_query(spark, src, ckpt, "state_t3")
    md = spark.read.format("state-metadata").load(ckpt).collect()
    assert len(md) == 1
    row = md[0]
    assert row["operatorName"] == "stateStoreSave"  # streaming aggregate
    assert row["numPartitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # exactly one availableNow run -> one committed batch
    assert row["minBatchId"] == 0 and row["maxBatchId"] == 0
