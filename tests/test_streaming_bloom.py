"""Streaming Bloom screen: byte-exact convergence to the batch bitmap,
idempotent-OR replay safety, live-probe equality with the certified
exact op, and crash-safe compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.corpus import _TRAIN_LT, _md5_bucket
from go_pulsar_elasticsearch_spark.llm.decontamination import (
    build_bloom_df,
    decontam_ngram_overlap,
    gram_hashes,
    might_contain_udf,
)
from go_pulsar_elasticsearch_spark.streaming import bloom_monitor as bm

gpe.load_all()


def _docs(spark, sf_dir):
    return t(spark, sf_dir, "documents").select("doc_id", "text")


def _batch_bytes(df) -> bytes:
    return bytes(build_bloom_df(gram_hashes(df, split=False)).collect()[0]["bloom"])


def test_streamed_store_equals_single_pass_bytes(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    src = str(tmp_path / "docs")
    for m in range(3):  # three files -> three micro-batches
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = str(tmp_path / "store")
    bm.run_bloom_monitor(spark, src, store, str(tmp_path / "ckpt"))
    assert bm.merged_bloom_bytes(spark, store) == _batch_bytes(docs)


def test_replay_and_overlap_are_invisible(spark, sf_dir, tmp_path):
    """Idempotent OR: a replayed epoch, and even the SAME batch folded
    under a second epoch id (overlap a checkpoint could never cause),
    leave the merged bitmap byte-identical."""
    docs = _docs(spark, sf_dir)
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 != 0)
    store = str(tmp_path / "store")
    bm.write_epoch(b0, store, epoch_id=0)
    bm.write_epoch(b1, store, epoch_id=1)
    base = bm.merged_bloom_bytes(spark, store)
    bm.write_epoch(b0, store, epoch_id=0)  # checkpoint replay
    assert bm.merged_bloom_bytes(spark, store) == base
    bm.write_epoch(b0, store, epoch_id=2)  # duplicate content, new epoch
    assert bm.merged_bloom_bytes(spark, store) == base


def test_live_screen_reproduces_exact_decontam(spark, sf_dir, tmp_path):
    """Probing eval grams against the STREAMED bitmap and exact-verifying
    the candidates reproduces the certified batch op exactly."""
    docs = _docs(spark, sf_dir)
    train_docs = docs.filter(_md5_bucket("doc_id") < _TRAIN_LT)
    src = str(tmp_path / "docs")
    for m in range(3):
        train_docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = str(tmp_path / "store")
    bm.run_bloom_monitor(spark, src, store, str(tmp_path / "ckpt"))

    hashed = gram_hashes(t(spark, sf_dir, "documents"))
    probe = might_contain_udf(
        spark, bm.merged_bloom_bytes(spark, store)
    )
    candidates = (
        hashed.filter(~F.col("is_train"))
        .filter(probe("h1", "h2"))
        .select("doc_id", "gram")
    )
    train_grams = hashed.filter("is_train").select("gram").distinct()
    live = sorted(
        (r.doc_id, r.n_leaked_grams)
        for r in candidates.join(train_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_leaked_grams"))
        .collect()
    )
    batch = sorted(
        (r.doc_id, r.n_leaked_grams)
        for r in decontam_ngram_overlap(spark, sf_dir).collect()
    )
    assert live == batch and batch


def test_compact_preserves_bytes_and_resumes_after_crash(
    spark, sf_dir, tmp_path, monkeypatch
):
    docs = _docs(spark, sf_dir)
    store = str(tmp_path / "store")
    for e in range(4):
        bm.write_epoch(
            docs.filter(F.col("doc_id") % 4 == e), store, epoch_id=e
        )
    before = bm.merged_bloom_bytes(spark, store)

    folded = bm.compact_store(spark, store, below_epoch=3)
    assert folded == 3
    assert bm.merged_bloom_bytes(spark, store) == before
    # idempotent: nothing left to fold below 3
    assert bm.compact_store(spark, store, below_epoch=3) == 0
    assert bm.merged_bloom_bytes(spark, store) == before

    # crash mid-resume: first rmtree raises; re-running compact resumes
    # from the published marker and converges to the same bytes
    bm.compact_store(spark, store, below_epoch=4)  # fold baseline + e3
    for e in range(4, 6):
        bm.write_epoch(
            docs.filter(F.col("doc_id") % 4 == e - 4), store, epoch_id=e
        )
    want = bm.merged_bloom_bytes(spark, store)

    real_rmtree = bm.shutil.rmtree
    calls = {"n": 0}

    def exploding_rmtree(path, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected crash")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(bm.shutil, "rmtree", exploding_rmtree)
    with pytest.raises(OSError):
        bm.compact_store(spark, store, below_epoch=6)
    monkeypatch.setattr(bm.shutil, "rmtree", real_rmtree)
    bm.compact_store(spark, store, below_epoch=6)  # resume
    assert bm.merged_bloom_bytes(spark, store) == want
