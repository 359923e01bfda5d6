"""Hard correctness evidence for the rows-only BPE operator: an
independent pure-Python BPE over the same histogram must agree
doc-for-doc, and the defining invariants of merging must hold."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.bpe import (
    bpe_encode,
    encode_word,
    train_bpe,
)


def _reference_counts(spark, sf_dir):
    """Re-derive the histogram, merges, and per-doc token counts with a
    straightforward reimplementation (no caching, no Arrow)."""
    rows = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    hist = Counter()
    for r in rows:
        for w in (r["text"] or "").split(" "):
            if w:
                hist[w] += 1
    merges = train_bpe(sorted(hist.items()))
    ranks = {p: i for i, p in enumerate(merges)}
    expected = {}
    for r in rows:
        words = [w for w in (r["text"] or "").split(" ") if w]
        expected[r["doc_id"]] = sum(len(encode_word(w, ranks)) for w in words)
    return merges, ranks, expected


def test_training_is_deterministic_and_productive():
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m1 = train_bpe(hist, n_merges=10)
    m2 = train_bpe(list(hist), n_merges=10)
    assert m1 == m2
    assert len(m1) == 10
    # the corpus's most frequent pair is merged first: 'es' appears in
    # newest(6) + widest(3) = 9, 'st' ties it -> 'es' < 'st' lexicographically
    assert m1[0] == ("e", "s")


def test_encode_word_invariants():
    hist = [("aaab", 4), ("aab", 2)]
    merges = train_bpe(hist, n_merges=3)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("aaab", "aab", "ab", "zzz"):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w          # lossless
        assert 1 <= len(toks) <= len(w)    # never longer than chars
    assert encode_word("zzz", {}) == ["z", "z", "z"]  # zero merges = chars


def test_operator_matches_independent_reference(spark, sf_dir):
    _, _, expected = _reference_counts(spark, sf_dir)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode(spark, sf_dir).collect()
    }
    assert got == expected


def test_compression_ratio_bounds(spark, sf_dir):
    out = bpe_encode(spark, sf_dir)
    bad = out.filter(
        (F.col("chars_per_token") < 1.0)
        | (F.col("n_bpe_tokens") > F.col("n_word_chars"))
    ).count()
    assert bad == 0
    # merges actually bite: corpus-wide mean compression > 1 char/token
    avg = out.agg(F.avg("chars_per_token")).first()[0]
    assert avg > 1.0
