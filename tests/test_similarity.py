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
