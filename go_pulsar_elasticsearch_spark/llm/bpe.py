"""BPE tokenizer: train on the distributed word histogram, encode the
corpus with the learned merges.

`bpe_merge_stats` (llm/corpus.py) exposes the FIRST merge's pair table;
this module runs the whole loop the way production tokenizer trainers
(sentencepiece, HF tokenizers) actually do it — over the *word
histogram*, not the raw corpus:

  train   one corpus-sized shuffle collapses the corpus to (word, count)
          — vocabulary-sized by Heaps' law — which collects to the
          driver; the merge loop is then pure Python over the histogram
          (each of the M iterations touches |vocab| segmented words,
          data-size-independent).  This is exactly the split real
          trainers use: counting is the distributed part, merging never
          needs the corpus again.
  encode  broadcast the rank-ordered merge table; one Arrow-batched
          pass re-tokenizes every document by greedy lowest-rank merge
          (the canonical BPE encode), emitting per-doc token counts and
          the compression ratio chars/token that tokenizer-quality
          dashboards track.

Registered rows-only: the merge loop is iterative-greedy and not
expressible in ANSI SQL (the instructions' "iterative algorithms"
escape hatch).  Hard evidence is tests/test_bpe.py: an independent
pure-Python BPE (trained on the same histogram, encoding doc-by-doc)
must agree token-for-token, and invariants (merging never increases
token count; zero-merge encode = character count) hold corpus-wide.

100 TB posture: the histogram shuffle is the only data-sized exchange
(uniform word keys, map-side combined); the driver-side loop scales
with |vocab| * M, not corpus size; the encode is a stateless narrow
map with a model-sized (M-row) broadcast.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_BPE_MERGES = 60


def train_bpe(histogram: list[tuple[str, int]], n_merges: int = _BPE_MERGES):
    """Classic BPE training over a (word, count) histogram.  Ties break
    lexicographically on the pair so the merge list is deterministic.
    Returns the ordered merge list [(left, right), ...]."""
    segs = {w: tuple(w) for w, _ in histogram}
    counts = dict(histogram)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for w, parts in segs.items():
            c = counts[w]
            for a, b in zip(parts, parts[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + c
        if not pair_freq:
            break
        # highest count; ties -> lexicographically smallest pair
        pair = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for w, parts in segs.items():
            if pair[0] not in parts:
                continue
            out = []
            i = 0
            while i < len(parts):
                if (
                    i + 1 < len(parts)
                    and parts[i] == pair[0]
                    and parts[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            segs[w] = tuple(out)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode: repeatedly merge the present pair with the
    LOWEST merge rank (the canonical GPT-2/sentencepiece encode order),
    until no learned pair remains."""
    parts = list(word)
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


@register("bpe_encode")  # rows-only: iterative greedy merge training
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 60 BPE merges on the corpus word histogram, then encode
    every document; emits per-doc BPE token counts and the
    chars-per-token compression ratio (see module docstring)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    hist_rows = (
        docs.select(F.explode(F.split("text", " ")).alias("wd"))
        .filter(F.col("wd") != "")
        .groupBy("wd")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    histogram = sorted((r["wd"], r["c"]) for r in hist_rows)
    merges = train_bpe(histogram)
    ranks = {pair: i for i, pair in enumerate(merges)}

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            n_tok, n_char = [], []
            for text in pdf["text"]:
                words = [w for w in (text or "").split(" ") if w]
                total = 0
                chars = 0
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = len(encode_word(w, ranks))
                        cache[w] = got
                    total += got
                    chars += len(w)
                n_tok.append(total)
                n_char.append(chars)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bpe_tokens": pd.Series(n_tok, dtype="int64"),
                    "n_word_chars": pd.Series(n_char, dtype="int64"),
                }
            )

    out = docs.select("doc_id", "text").mapInPandas(
        enc, "doc_id long, n_bpe_tokens long, n_word_chars long"
    )
    return out.select(
        "doc_id",
        "n_bpe_tokens",
        "n_word_chars",
        # NULL (not NaN) for a wordless doc: 0.0/0 is IEEE NaN, which
        # would poison downstream averages
        F.when(
            F.col("n_bpe_tokens") > 0,
            F.col("n_word_chars").cast("double") / F.col("n_bpe_tokens"),
        ).alias("chars_per_token"),
    )
