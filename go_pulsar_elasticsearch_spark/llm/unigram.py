"""Unigram-LM tokenizer (SentencePiece-style): seed a piece vocabulary
from frequent substrings, fit piece probabilities with Viterbi-EM over
the distributed word histogram, prune to a target size, encode.

Together with llm/bpe.py this completes the two tokenizer families real
pipelines train (HF tokenizers / sentencepiece ship exactly these two).
The split between engine and driver is the same as BPE's — and the same
one sentencepiece itself uses:

  distributed   ONE corpus-sized shuffle collapses the corpus to the
                (word, count) histogram — vocabulary-sized by Heaps'
                law — and a model-sized broadcast drives the final
                Arrow-batched encode pass.
  driver        the EM loop runs over the collected histogram (each
                iteration touches |word vocab| entries, data-size-
                independent).  Bounded state, like BPE's merge table
                and the k-means centroids (llm/clustering.py).

Determinism: this is HARD (Viterbi) EM — each word's count flows to the
pieces of its single best segmentation, so per-iteration piece counts
are INTEGERS and every re-estimation is an associative integer sum; no
float accumulation order can perturb the model.  Viterbi ties break on
(fewer pieces, then the lexicographically smaller piece at the earliest
split), making segmentation a pure function of (word, vocab).  Pruning
keeps the top pieces by (count DESC, piece ASC) and never drops single
characters, so every word stays segmentable.

Registered rows-only (the instructions' iterative-algorithms escape
hatch): EM is not expressible in ANSI SQL.  Hard evidence is
tests/test_unigram.py: Viterbi must agree with brute-force enumeration
over ALL segmentations, the hard-EM objective is non-decreasing at
fixed vocabulary, and the encode is invariant across runs.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_MAX_PIECE_LEN = 4
_SEED_SIZE = 400
_VOCAB_TARGET = 120
_EM_ITERS = 4


def seed_vocab(
    histogram: list[tuple[str, int]],
    max_len: int = _MAX_PIECE_LEN,
    seed_size: int = _SEED_SIZE,
) -> list[str]:
    """Seed pieces: the `seed_size` most frequent substrings of length
    2..max_len (occurrences weighted by word count, every position
    counted), plus ALL single characters (the coverage floor).  Ties
    break on the lexicographically smaller piece."""
    sub_counts: dict[str, int] = {}
    chars: set[str] = set()
    for w, c in histogram:
        chars.update(w)
        for ln in range(2, max_len + 1):
            for i in range(len(w) - ln + 1):
                s = w[i : i + ln]
                sub_counts[s] = sub_counts.get(s, 0) + c
    top = sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    return sorted(chars) + [s for s, _ in top]


def viterbi_segment(word: str, lp: dict[str, float]) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs ``lp``.
    Maximizes total log-prob; ties prefer FEWER pieces, then the longer
    (hence lexicographically earlier split) final piece.  Every single
    character is guaranteed present in ``lp`` by construction, so a
    segmentation always exists."""
    n = len(word)
    # dp[i] = (score, n_pieces, back_j) for best segmentation of word[:i]
    NEG = float("-inf")
    dp: list[tuple[float, int, int]] = [(0.0, 0, -1)] + [(NEG, 0, -1)] * n
    for i in range(1, n + 1):
        best = (NEG, 0, -1)
        for j in range(max(0, i - _MAX_PIECE_LEN), i):
            piece = word[j:i]
            p = lp.get(piece)
            if p is None or dp[j][0] == NEG:
                continue
            score = dp[j][0] + p
            cand = (score, dp[j][1] + 1, j)
            # higher score wins; then fewer pieces; then smaller j
            # (= longer final piece)
            if best[2] < 0 or (
                (cand[0], -cand[1], -cand[2]) > (best[0], -best[1], -best[2])
            ):
                best = cand
        dp[i] = best
    out: list[str] = []
    i = n
    while i > 0:
        j = dp[i][2]
        if j < 0:
            # a character outside ``lp`` makes the word unsegmentable;
            # fail fast rather than return a silently non-covering
            # segmentation (the registered ops always pass a model with
            # the single-character floor, but external vocabularies may
            # not)
            raise ValueError(
                f"word {word!r} not segmentable under the given vocabulary"
            )
        out.append(word[j:i])
        i = j
    return out[::-1]


def _logprobs(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def train_unigram(
    histogram: list[tuple[str, int]],
    vocab_target: int = _VOCAB_TARGET,
    iters: int = _EM_ITERS,
) -> dict[str, int]:
    """Viterbi-EM: seed -> (segment, re-count, prune) x iters.  Returns
    the final integer piece counts (the model; log-probs derive from
    them).  Single characters are never pruned and carry a +1 count
    floor so coverage survives even for characters unused by any best
    segmentation."""
    chars = sorted({ch for w, _ in histogram for ch in w})
    pieces = seed_vocab(histogram)
    # initial model: substring frequencies as pseudo-counts
    counts: dict[str, int] = {p: 1 for p in pieces}
    for w, c in histogram:
        for ln in range(1, _MAX_PIECE_LEN + 1):
            for i in range(len(w) - ln + 1):
                s = w[i : i + ln]
                if s in counts:
                    counts[s] += c
    for it in range(iters):
        lp = _logprobs(counts)
        new_counts: dict[str, int] = {}
        for w, c in histogram:
            for piece in viterbi_segment(w, lp):
                new_counts[piece] = new_counts.get(piece, 0) + c
        # coverage floor: every character survives with at least count 1
        for ch in chars:
            new_counts[ch] = new_counts.get(ch, 0) + 1
        # prune toward the target: keep single chars plus the best
        # multi-char pieces by (count DESC, piece ASC); shrink gradually
        # (75% per round, the sentencepiece schedule) so EM can re-route
        # counts before the final cut
        multi = sorted(
            ((p, c) for p, c in new_counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        keep_multi = max(
            vocab_target - len(chars),
            int(len(multi) * 0.75) if it < iters - 1 else 0,
        )
        counts = {ch: new_counts[ch] for ch in chars}
        counts.update(dict(multi[:keep_multi]))
    return counts


def _corpus_model(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    docs = t(spark, sf_dir, "documents")
    hist_rows = (
        docs.select(F.explode(F.split("text", " ")).alias("wd"))
        .filter(F.col("wd") != "")
        .groupBy("wd")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    histogram = sorted((r["wd"], r["c"]) for r in hist_rows)
    return train_unigram(histogram)


@register("unigram_tokenizer_train")  # rows-only: iterative EM
def unigram_tokenizer_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram-LM vocabulary and emit it: (piece, count,
    logprob).  Output is model-sized (~vocab_target rows), counts are
    exact integers from the final hard-EM pass, log-probs derive from
    them (rounded to 6 decimals for cross-run stability)."""
    tune(spark)
    counts = _corpus_model(spark, sf_dir)
    total = sum(counts.values())
    rows = [
        (p, int(c), round(math.log(c / total), 6))
        for p, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    return spark.createDataFrame(rows, "piece string, count long, logprob double")


@register("unigram_encode_fertility")  # rows-only: model from iterative EM
def unigram_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the trained unigram model (broadcast,
    model-sized) in one Arrow-batched pass; emits per-doc token counts
    and the fertility (tokens per word) and chars-per-token ratios that
    tokenizer-quality dashboards track — the unigram twin of
    `bpe_encode` and `tokenizer_fertility`."""
    tune(spark)
    counts = _corpus_model(spark, sf_dir)
    lp = _logprobs(counts)
    docs = t(spark, sf_dir, "documents")

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            n_tok, n_wrd, n_chr = [], [], []
            for text in pdf["text"]:
                words = [w for w in (text or "").split(" ") if w]
                total = chars = 0
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = len(viterbi_segment(w, lp))
                        cache[w] = got
                    total += got
                    chars += len(w)
                n_tok.append(total)
                n_wrd.append(len(words))
                n_chr.append(chars)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_unigram_tokens": pd.Series(n_tok, dtype="int64"),
                    "n_words": pd.Series(n_wrd, dtype="int64"),
                    "n_word_chars": pd.Series(n_chr, dtype="int64"),
                }
            )

    out = docs.select("doc_id", "text").mapInPandas(
        enc,
        "doc_id long, n_unigram_tokens long, n_words long, n_word_chars long",
    )
    return out.select(
        "doc_id",
        "n_unigram_tokens",
        "n_words",
        F.when(
            F.col("n_words") > 0,
            F.col("n_unigram_tokens").cast("double") / F.col("n_words"),
        ).alias("fertility"),
        F.when(
            F.col("n_unigram_tokens") > 0,
            F.col("n_word_chars").cast("double") / F.col("n_unigram_tokens"),
        ).alias("chars_per_token"),
    )
