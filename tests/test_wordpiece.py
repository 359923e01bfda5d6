"""WordPiece encode: piece-for-piece agreement with an INDEPENDENT
greedy-matcher implementation over an independently re-derived
vocabulary, plus the semantic properties (real subword segmentation,
BERT whole-word [UNK] semantics, fertility arithmetic)."""

from __future__ import annotations

import pytest

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from go_pulsar_elasticsearch_spark.llm.wordpiece import (  # noqa: E402
    _WP_MAX_PIECE,
    _WP_TOP_PREFIX,
    _WP_TOP_SUFFIX,
    _WP_TOP_WORDS,
    build_wordpiece_vocab,
    wordpiece_encode,
    wordpiece_encode_fertility,
)


def _ref_vocab(hist):
    """Independent vocabulary re-derivation (different code shape:
    dict comprehensions + Counter) from the same histogram."""
    from collections import Counter

    vocab = set()
    for w, _ in hist:
        vocab.update(w)
        vocab.update("##" + ch for ch in w)
    vocab.update(
        w for w, _ in sorted(hist, key=lambda kv: (-kv[1], kv[0]))[:_WP_TOP_WORDS]
    )
    pref, suff = Counter(), Counter()
    for w, c in hist:
        for ln in (2, 3, 4):
            if len(w) > ln:
                pref[w[:ln]] += c
        for ln in (2, 3):
            if len(w) > ln:
                suff[w[-ln:]] += c
    vocab.update(
        p for p, _ in sorted(pref.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_WP_TOP_PREFIX
        ]
    )
    vocab.update(
        "##" + s
        for s, _ in sorted(suff.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_WP_TOP_SUFFIX
        ]
    )
    return vocab


def _ref_encode(word, vocab):
    """Independent greedy matcher (recursive shape)."""
    out = []
    pos = 0
    while pos < len(word):
        match = None
        for end in range(min(len(word), pos + _WP_MAX_PIECE), pos, -1):
            piece = word[pos:end] if pos == 0 else "##" + word[pos:end]
            if piece in vocab:
                match = (piece, end)
                break
        if match is None:
            return ["[UNK]"]
        out.append(match[0])
        pos = match[1]
    return out


def test_wordpiece_matches_independent_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    from collections import Counter

    hist_c = Counter()
    for r in docs:
        for w in r.text.split(" "):
            if w:
                hist_c[w] += 1
    hist = sorted(hist_c.items())
    vocab = _ref_vocab(hist)
    assert vocab == build_wordpiece_vocab(hist)

    rows = {
        r.doc_id: r
        for r in wordpiece_encode_fertility(spark, sf_dir).collect()
    }
    assert set(rows) == {r.doc_id for r in docs}
    seg_happened = False
    for r in docs:
        words = [w for w in r.text.split(" ") if w]
        want_pieces = want_unk = 0
        for w in words:
            enc = _ref_encode(w, vocab)
            assert enc == wordpiece_encode(w, vocab), w
            want_pieces += len(enc)
            want_unk += enc == ["[UNK]"]
            if len(enc) > 1 and enc != ["[UNK]"]:
                seg_happened = True
        got = rows[r.doc_id]
        assert got.n_words == len(words)
        assert got.n_pieces == want_pieces
        assert got.n_unk == want_unk
        if words:
            assert got.fertility == pytest.approx(
                round(want_pieces / len(words), 6)
            )
    # the vocab is engineered so real subword segmentation occurs
    assert seg_happened
    # lowercase corpus: every char is a piece, so no UNKs
    assert all(r.n_unk == 0 for r in rows.values())


def test_wordpiece_unk_is_whole_word(spark):
    """BERT semantics: an unmatchable word becomes ONE [UNK], not a
    partial encode."""
    vocab = {"a", "##b"}
    assert wordpiece_encode("ab", vocab) == ["a", "##b"]
    assert wordpiece_encode("ba", vocab) == ["[UNK]"]  # 'b' start missing
    assert wordpiece_encode("aZb", vocab) == ["[UNK]"]  # mid-word miss


def test_wordpiece_longest_match_first():
    vocab = {"un", "unab", "##le", "##able", "u", "n", "##a", "##b"}
    # greedy takes 'unab' (len 4) over 'un', then '##le'
    assert wordpiece_encode("unable", vocab) == ["unab", "##le"]
