"""Invariants for the quality/segment-dedup operators that the oracle
hash can't express as clearly: reassembly fidelity and rule coherence."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.quality import (
    gopher_quality_filter,
    segment_dedup,
)


def test_segment_reassembly_is_lossless_when_nothing_removed(spark, sf_dir):
    out = segment_dedup(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    joined = out.filter(F.col("n_removed") == 0).join(docs, "doc_id")
    mismatches = joined.filter(F.col("kept_text") != F.col("text")).count()
    assert mismatches == 0
    # and some docs actually had segments removed (the filter does work)
    assert out.filter(F.col("n_removed") > 0).count() > 0


def test_gopher_keep_is_conjunction_of_rules(spark, sf_dir):
    out = gopher_quality_filter(spark, sf_dir)
    bad = out.filter(
        F.col("keep")
        != (
            F.col("ok_words")
            & F.col("ok_word_len")
            & F.col("ok_symbols")
            & F.col("ok_stopwords")
        )
    ).count()
    assert bad == 0
    # rules discriminate: both kept and dropped docs exist
    assert 0 < out.filter("keep").count() < out.count()
