"""html_extract_main: independent Python reconstruction of the expected
main text (the operator must recover paragraphs + the content div and
drop every chrome block)."""

from __future__ import annotations

import hashlib

from go_pulsar_elasticsearch_spark.ingest.html_extract import (
    _PARA_WORDS,
    html_extract_main,
)

SF = "/root/testdata/sf0.001"

_CONTENT_LINE = "Price & availability: 50 < 100"


def _expected(text: str) -> tuple[int, str]:
    words = text.split(" ")
    paras = [
        " ".join(words[i : i + _PARA_WORDS])
        for i in range(0, len(words), _PARA_WORDS)
    ]
    paras = [p for p in paras if p.strip() != ""]
    lines = paras + [_CONTENT_LINE]
    return len(lines), "\n".join(lines)


def test_extraction_recovers_paragraphs_and_drops_chrome(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    out = {r.doc_id: r for r in html_extract_main(spark, SF).collect()}
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        n_blocks, main = _expected(text)
        r = out[doc_id]
        assert r.n_blocks == n_blocks, (doc_id, r.n_blocks, n_blocks)
        assert r.main_len == len(main)
        assert r.main_md5 == hashlib.md5(main.encode()).hexdigest(), doc_id
        # chrome must never leak into the main text
        for boiler in ("Subscribe", "Example Corp", "Home", "track", "<"):
            if boiler == "<":
                assert "<" not in main.replace("50 < 100", "")
            else:
                assert boiler not in main
