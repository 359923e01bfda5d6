"""Semantic invariants for the LM-scoring/weighted-selection operators
(llm/lm_score.py) that the oracle hash doesn't express directly:
probability-mass coherence, KL non-negativity, and that the E-S sample
actually tilts toward the weight."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.lm_score import (
    kl_domain_divergence,
    lm_perplexity_bucket,
    weighted_sample_wor,
)


def test_perplexity_ce_bounds_and_buckets(spark, sf_dir):
    out = lm_perplexity_bucket(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    # one output row per document that has at least one token
    n_docs = docs.filter(F.trim("text") != "").count()
    assert out.count() == n_docs
    # CE under an add-one-smoothed unigram LM is bounded below by the
    # best single-token log-prob and above by ln(N+V) (the rarest)
    stats = out.agg(F.min("ce").alias("lo"), F.max("ce").alias("hi")).first()
    assert 0.0 < stats["lo"] <= stats["hi"]
    # buckets partition the output and respect the threshold order
    byb = {r["bucket"]: r for r in out.groupBy("bucket").agg(
        F.min("ce").alias("lo"), F.max("ce").alias("hi"), F.count("*").alias("n")
    ).collect()}
    assert sum(r["n"] for r in byb.values()) == n_docs
    if "head" in byb and "middle" in byb:
        assert byb["head"]["hi"] <= byb["middle"]["lo"] + 1e-12
    if "middle" in byb and "tail" in byb:
        assert byb["middle"]["hi"] <= byb["tail"]["lo"] + 1e-12


def test_perplexity_matches_handrolled_lm_on_one_doc(spark, sf_dir):
    """Recompute one document's CE with a driver-side LM built from the
    same tokenization and compare to the operator's answer."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    counts = {r["w"]: r["c"] for r in tok.groupBy("w").agg(F.count("*").alias("c")).collect()}
    n = sum(counts.values())
    v = len(counts)
    target = tok.orderBy("doc_id").first()["doc_id"]
    words = [r["w"] for r in tok.filter(F.col("doc_id") == target).collect()]
    expected = -sum(
        round(math.log((counts[w] + 1) / (n + v)), 6) for w in words
    ) / len(words)
    got = (
        lm_perplexity_bucket(spark, sf_dir)
        .filter(F.col("doc_id") == target)
        .first()["ce"]
    )
    assert abs(got - expected) < 1e-9


def test_kl_nonnegative_and_source_complete(spark, sf_dir):
    out = kl_domain_divergence(spark, sf_dir).collect()
    sources = {
        r["source"]
        for r in t(spark, sf_dir, "documents").select("source").distinct().collect()
    }
    assert {r["source"] for r in out} == sources
    # Gibbs: KL(P||Q) >= 0 up to the 1e-6 log rounding; with smoothing
    # the corpus self-distribution never makes any term blow up
    for r in out:
        assert r["kl"] >= -1e-4, (r["source"], r["kl"])
        assert r["n_tok"] > 0


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """E-S keys with w = n_chars must produce a sample whose average
    length exceeds the corpus average (long docs are more likely), while
    staying a strict subset of the corpus with exactly K rows."""
    out = weighted_sample_wor(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 50
    assert len({r["doc_id"] for r in rows}) == 50  # without replacement
    docs = t(spark, sf_dir, "documents")
    corpus_avg = docs.agg(F.avg("n_chars")).first()[0]
    sample_avg = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_avg > corpus_avg
    # deterministic: a second run picks the identical set
    again = {r["doc_id"] for r in weighted_sample_wor(spark, sf_dir).collect()}
    assert again == {r["doc_id"] for r in rows}
