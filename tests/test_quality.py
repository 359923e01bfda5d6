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


def test_quality_classifier_separates_classes(spark, sf_dir):
    """The LR quality classifier must genuinely separate the weak
    classes: AUC >= 0.85 vs the gopher labels, and its top-confidence
    decile must be overwhelmingly keep-labeled."""
    import go_pulsar_elasticsearch_spark as gpe
    from go_pulsar_elasticsearch_spark.registry import QUERIES

    gpe.load_all()
    rows = QUERIES["quality_classifier_lr"](spark, sf_dir).collect()
    assert len(rows) > 100
    # Mann-Whitney AUC from ranks
    scored = sorted(rows, key=lambda r: r["p_good"])
    pos = [i for i, r in enumerate(scored, 1) if r["label_weak"]]
    n_pos, n_neg = len(pos), len(scored) - len(pos)
    assert n_pos > 10 and n_neg > 10, "degenerate fixture labels"
    auc = (sum(pos) - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert auc >= 0.85, f"AUC {auc:.3f}"
    top = scored[-len(scored) // 10 :]
    frac_keep = sum(r["label_weak"] for r in top) / len(top)
    assert frac_keep >= 0.9, f"top-decile keep fraction {frac_keep:.2f}"
