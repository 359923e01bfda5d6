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
