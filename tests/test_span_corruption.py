"""span_corruption_prep: independent Python reconstruction of the
masked input/target pair (sentinel numbering, span merging at run
boundaries, md5-positioned starts)."""

from __future__ import annotations

import hashlib

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.corpus import (
    _SC_SPAN,
    _SC_START_LT,
    span_corruption_prep,
)

SF = "/root/testdata/sf0.001"


def _start(doc_id: int, p: int) -> bool:
    if p < 1:
        return False
    h = hashlib.md5(f"{doc_id}:{p}".encode()).hexdigest()
    return int(h[:2], 16) < _SC_START_LT


def _expected(doc_id: int, text: str):
    words = text.split(" ")
    n = len(words)
    mask = [
        any(_start(doc_id, p - j) for j in range(_SC_SPAN))
        for p in range(1, n + 1)
    ]
    inp, tgt, n_masked, sid = [], [], 0, 0
    for i in range(n):
        run_start = mask[i] and (i == 0 or not mask[i - 1])
        if run_start:
            sid += 1
            s = f"<extra_id_{sid}>"
            inp.append(s)
            tgt.append(s)
        if mask[i]:
            n_masked += 1
            tgt.append(words[i])
        else:
            inp.append(words[i])
    return n_masked, sid, " ".join(inp), " ".join(tgt)


def test_pairs_match_independent_reconstruction(spark):
    docs = {
        r.doc_id: r.text
        for r in t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    out = {r.doc_id: r for r in span_corruption_prep(spark, SF).collect()}
    assert set(out) == set(docs)
    saw_masked = 0
    for doc_id, text in docs.items():
        n_masked, n_sent, inp, tgt = _expected(doc_id, text)
        r = out[doc_id]
        assert (r.n_masked, r.n_sentinels) == (n_masked, n_sent), doc_id
        assert r.input_md5 == hashlib.md5(inp.encode()).hexdigest(), doc_id
        assert r.target_md5 == hashlib.md5(tgt.encode()).hexdigest(), doc_id
        saw_masked += n_masked > 0
    # the operating point actually corrupts a healthy share of docs
    assert saw_masked > len(docs) * 0.5
