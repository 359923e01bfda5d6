"""rag_chunk_retrieval (llm/hybrid.py): the chunk -> embed -> score ->
parent-collapse -> top-k retrieval chain.  Oracle equivalence is
certified by the registry sweep; these pin the retrieval semantics —
the collapse really keeps each doc's best chunk, the embedding is the
declared hash-bucket function, and ranks follow scores.
"""

from __future__ import annotations

import hashlib
import math

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from go_pulsar_elasticsearch_spark.catalog import t  # noqa: E402
from go_pulsar_elasticsearch_spark.llm.hybrid import (  # noqa: E402
    _RAG_DIMS,
    _RAG_HEX,
    _RAG_QN2,
    _RAG_QV,
    _RAG_S,
    _RAG_TOPK,
    _RAG_W,
    rag_chunk_retrieval,
)


def _embed(tokens):
    vec = [0] * _RAG_DIMS
    for w in tokens:
        if w:
            d = hashlib.md5(w.encode()).hexdigest()[0]
            vec[_RAG_HEX.index(d) % _RAG_DIMS] += 1
    return vec


def _chunks(text):
    w = text.split(" ")
    for s in range(0, len(w), _RAG_S):
        yield s // _RAG_S, [x for x in w[s : s + _RAG_W] if x != ""]


def test_rag_collapse_keeps_each_docs_best_chunk(spark, sf_dir):
    rows = rag_chunk_retrieval(spark, sf_dir).collect()
    assert 0 < len(rows) <= _RAG_TOPK
    texts = {
        r["doc_id"]: r["text"]
        for r in t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    prev = None
    for r in sorted(rows, key=lambda r: r["rk"]):
        # python reference: score every chunk of this doc, take max
        best = None
        for cid, toks in _chunks(texts[r["doc_id"]]):
            v = _embed(toks)
            n2 = sum(x * x for x in v)
            if n2 == 0:
                continue
            cos = sum(a * b for a, b in zip(v, _RAG_QV)) / (
                math.sqrt(n2) * math.sqrt(_RAG_QN2)
            )
            if best is None or (cos, -cid) > (best[0], -best[1]):
                best = (cos, cid)
        assert best is not None
        assert r["best_chunk_id"] == best[1]
        assert math.isclose(r["score"], best[0], rel_tol=1e-12)
        assert -1.0 <= r["score"] <= 1.0
        if prev is not None:
            assert r["score"] <= prev + 1e-12
        prev = r["score"]


def test_rag_query_vector_matches_declared_embedding(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.llm.hybrid import _RAG_QUERY

    assert _RAG_QV == _embed(_RAG_QUERY.split(" "))
    assert _RAG_QN2 == sum(v * v for v in _RAG_QV)
    assert sum(_RAG_QV) == len([w for w in _RAG_QUERY.split(" ") if w])
