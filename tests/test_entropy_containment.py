"""Invariants for text_entropy and ngram_containment beyond the oracle
hash: entropy bounds and the containment >= jaccard dominance law."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.dedup import ngram_containment, ngram_jaccard
from go_pulsar_elasticsearch_spark.llm.text_analysis import text_entropy


def test_entropy_bounds(spark, sf_dir):
    out = text_entropy(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    assert out.count() == docs.filter(F.length("text") > 0).count()
    # 0 <= H <= ln(n_symbols); ln(len(text)) is a valid upper bound for
    # both granularities (distinct symbols <= total symbols)
    bad = (
        out.join(docs.select("doc_id", F.length("text").alias("L")), "doc_id")
        .filter(
            (F.col("h_char") < -1e-4)
            | (F.col("h_word") < -1e-4)
            | (F.col("h_char") > F.log(F.col("L")) + 1e-4)
            | (F.col("h_word") > F.log(F.col("L")) + 1e-4)
        )
        .count()
    )
    assert bad == 0


def test_entropy_exact_on_known_distribution(spark, sf_dir):
    """H of 'aab' chars = -(2/3 ln(2/3) + 1/3 ln(1/3)) using round-6
    logs, matching the operator's certified arithmetic."""
    row = (
        text_entropy(spark, sf_dir)
        .join(
            t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
        )
        .first()
    )
    text = row["text"]
    counts: dict[str, int] = {}
    for ch in text:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(text)
    expected = -sum(c * round(math.log(c / n), 6) for c in counts.values()) / n
    assert abs(row["h_char"] - expected) < 1e-9


def test_containment_dominates_jaccard(spark, sf_dir):
    """For any pair, |A∩B|/min <= 1 and >= |A∩B|/|A∪B|: every
    jaccard-qualified pair at the same threshold must also qualify on
    containment, and containment values bound jaccard from above."""
    cont = ngram_containment(spark, sf_dir).select(
        "doc_a", "doc_b", F.col("containment").alias("cv")
    )
    jac = ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.5).select(
        "doc_a", "doc_b", F.col("jaccard").alias("jv")
    )
    joined = jac.join(cont, ["doc_a", "doc_b"], "left")
    rows = joined.collect()
    assert rows, "expected at least one high-jaccard pair in the fixture"
    for r in rows:
        assert r["cv"] is not None, "jaccard>=0.5 pair missing from containment"
        assert r["cv"] >= r["jv"] - 1e-9
        assert r["cv"] <= 1.0 + 1e-9
