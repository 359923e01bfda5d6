"""The numpy fast path must agree with the exact-decimal certified
baseline: same (qid, vid, rank) sets, cosines within float tolerance."""

from __future__ import annotations

import pytest

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.registry import QUERIES

gpe.load_all()


def test_fast_topk_matches_exact(spark, sf_dir):
    exact = {
        (r["qid"], r["vid"]): (r["rk"], r["cosine"])
        for r in QUERIES["similarity_topk"](spark, sf_dir).collect()
    }
    fast = {
        (r["qid"], r["vid"]): (r["rk"], r["cosine"])
        for r in QUERIES["similarity_topk_fast"](spark, sf_dir).collect()
    }
    assert set(exact) == set(fast)
    for k, (rk, cos) in exact.items():
        frk, fcos = fast[k]
        assert frk == rk, k
        assert fcos == pytest.approx(cos, abs=1e-9)


def test_ann_pq_recall_vs_exact(spark, sf_dir):
    """PQ+ADC with exact re-rank of the top-40 must recover most of the
    exact top-5 (recall@5 >= 0.9 on the fixtures), and every returned
    cosine must be the TRUE cosine (re-rank is exact), matching the
    exact operator's value for any (qid, vid) both return."""
    import pytest

    exact = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in QUERIES["similarity_topk"](spark, sf_dir).collect()
    }
    pq = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in QUERIES["ann_pq"](spark, sf_dir).collect()
    }
    hits = set(exact) & set(pq)
    recall = len(hits) / len(exact)
    assert recall >= 0.9, f"recall@5 {recall:.2f}"
    for k in hits:
        assert pq[k] == pytest.approx(exact[k], abs=1e-9), k


def test_ml_minhash_recovers_true_near_dup_pairs(spark, sf_dir):
    """The rows-only MLlib MinHashLSH variant gains real evidence: its
    candidate set (Jaccard distance <= 0.8) must recover >= 90% of the
    TRUE near-duplicate pairs certified by the oracled two-stage
    verify op (exact Jaccard >= 0.5 => distance <= 0.5, well inside
    the threshold)."""
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["minhash_verify_jaccard"](spark, sf_dir).collect()
    }
    ml = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["near_dedup_minhash_ml"](spark, sf_dir).collect()
    }
    assert len(truth) > 10, "fixture should contain true near-dups"
    recall = len(truth & ml) / len(truth)
    assert recall >= 0.9, f"ml recall of true pairs {recall:.2f}"


def test_ann_ivfpq_recall_vs_ivf_and_exact(spark, sf_dir):
    """IVF-PQ's candidates are bounded by the SAME probed lists as
    ann_ivf, so its top-k can never beat IVF's list recall — assert it
    recovers >= 0.8 of ann_ivf's hits AND every returned cosine is the
    true cosine (exact re-rank), matching the exact operator wherever
    both return a pair."""
    import pytest as _pytest

    ivf = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in QUERIES["ann_ivf"](spark, sf_dir).collect()
    }
    ivfpq = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in QUERIES["ann_ivfpq"](spark, sf_dir).collect()
    }
    hits = set(ivf) & set(ivfpq)
    assert len(hits) / len(ivf) >= 0.8, f"recall {len(hits)}/{len(ivf)}"
    exact = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in QUERIES["similarity_topk"](spark, sf_dir).collect()
    }
    for k in set(ivfpq) & set(exact):
        assert ivfpq[k] == _pytest.approx(exact[k], abs=1e-9), k


def test_ann_sq8_recall_vs_exact(spark, sf_dir):
    """int8 scalar quantization with exact re-rank must recover nearly
    all of the exact top-5 (int8 dot error ~1e-3 is far below the
    fixture's neighbor gaps), and every returned cosine is the TRUE
    cosine (re-rank is exact)."""
    import pytest

    exact = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in QUERIES["similarity_topk"](spark, sf_dir).collect()
    }
    sq = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in QUERIES["ann_sq8"](spark, sf_dir).collect()
    }
    hits = set(exact) & set(sq)
    recall = len(hits) / len(exact)
    assert recall >= 0.95, f"recall@5 {recall:.2f}"
    for k in hits:
        assert sq[k] == pytest.approx(exact[k], abs=1e-9), k
