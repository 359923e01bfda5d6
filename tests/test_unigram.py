"""Unigram-LM tokenizer: independent verification of the Viterbi-EM
training (llm/unigram.py) — the rows-only evidence the registry check
cannot provide for an iterative algorithm."""

from __future__ import annotations

import itertools
import math

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from go_pulsar_elasticsearch_spark.llm.unigram import (  # noqa: E402
    _MAX_PIECE_LEN,
    seed_vocab,
    train_unigram,
    unigram_encode_fertility,
    unigram_tokenizer_train,
    viterbi_segment,
)

_HIST = [
    ("lowering", 2),
    ("lowered", 3),
    ("lowest", 5),
    ("newest", 4),
    ("widest", 3),
    ("winner", 2),
    ("wider", 4),
]


def _brute_force_best(word: str, lp: dict[str, float]):
    """Enumerate ALL segmentations; return the max under the exact
    tie-break order Viterbi claims: score, then fewer pieces."""
    n = len(word)
    best = None
    for cuts in range(n):  # number of interior cut points
        for pos in itertools.combinations(range(1, n), cuts):
            bounds = (0, *pos, n)
            parts = [word[a:b] for a, b in zip(bounds, bounds[1:])]
            if any(len(p) > _MAX_PIECE_LEN or p not in lp for p in parts):
                continue
            score = sum(lp[p] for p in parts)
            key = (score, -len(parts))
            if best is None or key > best[0]:
                best = (key, parts)
    return best


def test_viterbi_matches_brute_force():
    counts = train_unigram(_HIST, vocab_target=30, iters=2)
    total = sum(counts.values())
    lp = {p: math.log(c / total) for p, c in counts.items()}
    for w, _ in _HIST:
        seg = viterbi_segment(w, lp)
        assert "".join(seg) == w
        key = (sum(lp[p] for p in seg), -len(seg))
        best = _brute_force_best(w, lp)
        assert best is not None
        # same score and piece count as the true optimum
        assert key == best[0]


def test_seed_has_char_floor_and_frequent_substrings():
    seeds = seed_vocab(_HIST)
    for ch in set("".join(w for w, _ in _HIST)):
        assert ch in seeds
    assert "est" in seeds  # 12 occurrences, the dominant suffix


def test_hard_em_objective_non_decreasing_at_fixed_vocab():
    """Between consecutive re-estimations WITHOUT pruning, the Viterbi
    log-likelihood of the corpus must not decrease (the hard-EM
    guarantee)."""
    chars = sorted({ch for w, _ in _HIST for ch in w})
    pieces = seed_vocab(_HIST)
    counts = {p: 1 for p in pieces}
    for w, c in _HIST:
        for ln in range(1, _MAX_PIECE_LEN + 1):
            for i in range(len(w) - ln + 1):
                s = w[i : i + ln]
                if s in counts:
                    counts[s] += c

    def objective(lp):
        return sum(
            c * sum(lp[p] for p in viterbi_segment(w, lp)) for w, c in _HIST
        )

    prev = None
    for _ in range(4):
        total = sum(counts.values())
        lp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
        obj = objective(lp)
        if prev is not None:
            assert obj >= prev - 1e-9
        prev = obj
        new_counts: dict[str, int] = {}
        for w, c in _HIST:
            for piece in viterbi_segment(w, lp):
                new_counts[piece] = new_counts.get(piece, 0) + c
        for ch in chars:
            new_counts[ch] = new_counts.get(ch, 0) + 1
        counts = new_counts


def test_train_deterministic_and_covering():
    a = train_unigram(_HIST)
    b = train_unigram(_HIST)
    assert a == b
    total = sum(a.values())
    lp = {p: math.log(c / total) for p, c in a.items()}
    for w, _ in _HIST:
        assert "".join(viterbi_segment(w, lp)) == w


def test_spark_ops(spark, sf_dir):
    vocab = unigram_tokenizer_train(spark, sf_dir).collect()
    assert vocab
    assert all(r["count"] > 0 for r in vocab)
    # log-probs normalize: sum of exp(logprob) ~ 1
    assert sum(math.exp(r.logprob) for r in vocab) > 0.99
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    enc = unigram_encode_fertility(spark, sf_dir).collect()
    assert len(enc) == n_docs
    for r in enc:
        if r.n_words:
            # a word never tokenizes to fewer than 1 piece, nor to more
            # pieces than characters
            assert r.fertility >= 1.0
            assert r.chars_per_token >= 1.0


def test_viterbi_property_random():
    """Hypothesis: on random words over a random piece vocabulary,
    Viterbi always returns a valid optimal segmentation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = "abc"

    @settings(max_examples=150, deadline=None)
    @given(
        word=st.text(alphabet=alphabet, min_size=1, max_size=8),
        extra=st.lists(
            st.text(alphabet=alphabet, min_size=2, max_size=_MAX_PIECE_LEN),
            max_size=6,
        ),
        weights=st.lists(
            st.integers(min_value=1, max_value=50), min_size=9, max_size=9
        ),
    )
    def check(word, extra, weights):
        pieces = sorted({*alphabet, *extra})
        counts = {p: weights[i % len(weights)] for i, p in enumerate(pieces)}
        total = sum(counts.values())
        lp = {p: math.log(c / total) for p, c in counts.items()}
        seg = viterbi_segment(word, lp)
        assert "".join(seg) == word
        best = _brute_force_best(word, lp)
        assert best is not None
        got = (sum(lp[p] for p in seg), -len(seg))
        assert got == best[0]

    check()


def test_viterbi_raises_on_uncovered_character():
    import pytest

    with pytest.raises(ValueError, match="not segmentable"):
        viterbi_segment("xy", {"x": -1.0})
