"""WordPiece encoding — the BERT-family tokenizer (Devlin et al. 2019;
Song et al. 2021 "Fast WordPiece Tokenization"), completing the
tokenizer trio next to BPE (llm/bpe.py) and the unigram LM
(llm/unigram.py).

WordPiece ENCODING is greedy longest-match-first: at each position take
the LONGEST vocabulary piece that matches (continuation pieces carry
the '##' prefix), emit it, continue; a word with no match at some
position encodes as [UNK].  Unlike BPE (apply merges in training
order) or unigram (Viterbi over piece log-probs), the encode needs
only set membership — which is why production serving uses it: one
trie walk per word.

The vocabulary here derives deterministically from the corpus word
histogram (driver-side, Heaps-bounded): every observed character as
both a start and a continuation piece (so lowercase corpora never hit
[UNK]), the top whole words, and the top frequency-weighted prefixes /
'##'-suffixes.  Deliberately, most corpus words are NOT whole-word
pieces, so real subword segmentation happens (pytest asserts it).

Rows-only by declaration (the iterative longest-match loop has no SQL
twin); tests/test_wordpiece.py re-derives the vocabulary and the greedy
matcher INDEPENDENTLY from the parquet and checks per-doc counts
piece-for-piece.

100 TB shape: the model is a broadcast piece set (KBs); the encode is
one Arrow-batched pass with a per-word memo — no shuffle at all until
the (optional) per-doc aggregate, and that output is doc-sized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_WP_TOP_WORDS = 12    # whole-word pieces (fixture vocab ~31 words, so
                      # most words MUST segment into subword pieces)
_WP_TOP_PREFIX = 20   # start pieces, length 2-4, by weighted frequency
_WP_TOP_SUFFIX = 30   # '##' continuation pieces, length 2-3
_WP_MAX_PIECE = 8     # longest-match window


def build_wordpiece_vocab(histogram: list[tuple[str, int]]) -> set[str]:
    """Deterministic vocabulary from a (word, count) histogram: chars
    (start + continuation), top whole words, top weighted prefixes and
    '##'-suffixes.  Pure function of the histogram — the independent
    test re-derives it from the same counts."""
    vocab: set[str] = set()
    for w, _c in histogram:
        for ch in w:
            vocab.add(ch)
            vocab.add("##" + ch)
    words = sorted(histogram, key=lambda kv: (-kv[1], kv[0]))
    vocab.update(w for w, _ in words[:_WP_TOP_WORDS])
    pref: dict[str, int] = {}
    suff: dict[str, int] = {}
    for w, c in histogram:
        for ln in (2, 3, 4):
            if len(w) > ln:
                pref[w[:ln]] = pref.get(w[:ln], 0) + c
        for ln in (2, 3):
            if len(w) > ln:
                s = w[-ln:]
                suff[s] = suff.get(s, 0) + c
    top_pref = sorted(pref.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab.update(p for p, _ in top_pref[:_WP_TOP_PREFIX])
    top_suff = sorted(suff.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab.update("##" + s for s, _ in top_suff[:_WP_TOP_SUFFIX])
    return vocab


def wordpiece_encode(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match-first; ['[UNK]'] when stuck (BERT
    semantics: the WHOLE word becomes [UNK], not the unmatched tail)."""
    pieces: list[str] = []
    i = 0
    while i < len(word):
        j = min(len(word), i + _WP_MAX_PIECE)
        while j > i:
            cand = word[i:j] if i == 0 else "##" + word[i:j]
            if cand in vocab:
                break
            j -= 1
        if j == i:
            return ["[UNK]"]
        pieces.append(cand)
        i = j
    return pieces


def _corpus_histogram(spark: SparkSession, sf_dir: str) -> list[tuple[str, int]]:
    rows = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("wd"))
        .filter(F.col("wd") != "")
        .groupBy("wd")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    return sorted((r["wd"], r["c"]) for r in rows)


@register("wordpiece_encode")  # rows-only: iterative greedy matching;
# piece-for-piece vs an independent reference in tests/test_wordpiece.py
def wordpiece_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the corpus-derived WordPiece vocab
    (broadcast, KB-sized) in one Arrow pass; emits per-doc word/piece/
    UNK counts and the fertility ratio tokenizer-quality dashboards
    track — directly comparable with `bpe_encode` and
    `unigram_encode_fertility` over the same corpus."""
    tune(spark)
    vocab = build_wordpiece_vocab(_corpus_histogram(spark, sf_dir))
    docs = t(spark, sf_dir, "documents")

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[int, int]] = {}  # word -> (n_pieces, is_unk)
        for pdf in batches:
            n_wrd, n_pc, n_unk = [], [], []
            for text in pdf["text"]:
                words = [w for w in (text or "").split(" ") if w]
                pieces = unks = 0
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        enc_w = wordpiece_encode(w, vocab)
                        got = (len(enc_w), int(enc_w == ["[UNK]"]))
                        memo[w] = got
                    pieces += got[0]
                    unks += got[1]
                n_wrd.append(len(words))
                n_pc.append(pieces)
                n_unk.append(unks)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_words": pd.Series(n_wrd, dtype="int64"),
                    "n_pieces": pd.Series(n_pc, dtype="int64"),
                    "n_unk": pd.Series(n_unk, dtype="int64"),
                }
            )

    out = docs.select("doc_id", "text").mapInPandas(
        enc, "doc_id long, n_words long, n_pieces long, n_unk long"
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_pieces",
        "n_unk",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_pieces") / F.col("n_words"), 6),
        ).otherwise(F.lit(None)).alias("fertility"),
    )
