"""Incremental streaming LM monitor: convergence to the certified batch
operator, replay idempotence, and prior-epoch-only reads."""

from __future__ import annotations

from pyspark.sql import functions as F

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.lm_score import lm_perplexity_bucket
from go_pulsar_elasticsearch_spark.streaming.lm_monitor import (
    accumulated_counts,
    run_lm_monitor,
    score_docs,
    score_lm_batch,
)

gpe.load_all()


def _rows(df):
    return {
        (r["doc_id"], r["n_tok"], repr(r["ce"]), r["bucket"])
        for r in df.collect()
    }


def test_final_store_reproduces_batch_operator(spark, sf_dir, tmp_path):
    """After draining the stream, the accumulated store holds exactly
    the whole-corpus counts: scoring the corpus against it must equal
    the certified batch operator bit-for-bit (repr of doubles)."""
    src = str(tmp_path / "docs")
    docs = t(spark, sf_dir, "documents")
    for m in range(3):  # three files -> three micro-batches
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store, out = str(tmp_path / "store"), str(tmp_path / "scored")
    run_lm_monitor(spark, src, store, out, str(tmp_path / "ckpt"))

    final_counts = accumulated_counts(spark, store)
    got = _rows(score_docs(docs, final_counts))
    want = _rows(lm_perplexity_bucket(spark, sf_dir))
    assert got == want

    # every doc was scored exactly once across epochs
    scored = spark.read.parquet(out)
    assert scored.count() == docs.count()
    assert scored.select("doc_id").distinct().count() == docs.count()


def test_replay_same_epoch_is_idempotent(spark, sf_dir, tmp_path):
    docs = t(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    store, out = str(tmp_path / "store"), str(tmp_path / "scored")
    score_lm_batch(spark, b0, store, out, epoch_id=0)
    first = _rows(spark.read.parquet(out))
    score_lm_batch(spark, b0, store, out, epoch_id=0)  # simulated replay
    second = _rows(spark.read.parquet(out))
    assert first == second
    # the store holds ONE epoch's counts, not doubled
    total = accumulated_counts(spark, store).agg(F.sum("c")).first()[0]
    expected = (
        b0.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .count()
    )
    assert total == expected


def test_epoch_scores_use_lm_so_far_only(spark, sf_dir, tmp_path):
    """Epoch 0's scores must come from batch-0 counts alone (prior
    store empty), recomputable from the helper on the same subset."""
    docs = t(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    store, out = str(tmp_path / "store"), str(tmp_path / "scored")
    score_lm_batch(spark, b0, store, out, epoch_id=0)
    got = _rows(spark.read.parquet(f"{out}/epoch=0"))
    counts0 = (
        b0.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    want = _rows(score_docs(b0, counts0))
    assert got == want
