"""Corpus-preparation operators: the steps between "curated documents"
and "training shards" in an LLM data pipeline.

  split_train_test — deterministic hash-based train/val/test assignment
                     (md5 bucket, no RNG: re-running the pipeline or
                     adding machines never moves a document between
                     splits — the property random splits lose at scale)
  pack_sequences   — token-budget chunking of the corpus manifest into
                     contiguous bins (the sequence-packing accounting
                     pass; the actual token concat happens shard-side)
  text_normalize   — lowercase / strip punctuation / collapse runs of
                     whitespace, the canonical pre-tokenization cleanup

All three are certified against DuckDB.  The hash-bucket trick (two md5
hex digits -> 0..255 via 1-based `instr`/`strpos` lookups, identical in
both engines) is the cross-engine analog of `hash() % N` and is also the
production shape: assignment is a narrow per-row expression, never a
shuffle or an RNG.

Reference parity note: the reference has no corpus stage at all (it is
an ingest connector, main.go:250-325); these extend the engine toward
the north-star training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.text_analysis import _BPE_RE
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_HEX = "0123456789abcdef"


def _md5_bucket(col: str) -> F.Column:
    """0..255 from the first two hex digits of md5(col) — deterministic,
    uniform, and expressible identically in Spark (`instr`) and DuckDB
    (`strpos`), both 1-based."""
    h = F.md5(F.col(col).cast("string"))
    d1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return (d1 * 16 + d2).cast("int")


def _MD5_BUCKET_SQL(col: str) -> str:
    return (
        f"CAST((strpos('{_HEX}', substr(md5(CAST({col} AS VARCHAR)), 1, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr(md5(CAST({col} AS VARCHAR)), 2, 1)) - 1) AS INTEGER)"
    )


# --------------------------------------------------------------------------
# split_train_test
# --------------------------------------------------------------------------

# ~90/5/5: bucket < 230 train, < 243 val, else test.
_TRAIN_LT, _VAL_LT = 230, 243

_SPLIT_ORACLE = f"""
SELECT
  doc_id,
  {_MD5_BUCKET_SQL('doc_id')} AS bucket,
  CASE
    WHEN {_MD5_BUCKET_SQL('doc_id')} < {_TRAIN_LT} THEN 'train'
    WHEN {_MD5_BUCKET_SQL('doc_id')} < {_VAL_LT} THEN 'val'
    ELSE 'test'
  END AS split
FROM documents
"""


@register("split_train_test", _SPLIT_ORACLE)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/5/5 split assignment keyed on md5(doc_id).
    Pure narrow projection — no shuffle, no RNG state; at 100 TB the
    assignment is recomputable anywhere (idempotent retries, exactly
    the property the reference's uuid-keyed upsert relies on,
    es.go:186)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    bucket = _md5_bucket("doc_id")
    split = (
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _VAL_LT, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", bucket.alias("bucket"), split.alias("split"))


# --------------------------------------------------------------------------
# pack_sequences
# --------------------------------------------------------------------------

_BIN_TOKENS = 2048

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM toks
), binned AS (
  SELECT doc_id, n_tokens,
    CAST(greatest(running - 1, 0) // {_BIN_TOKENS} AS BIGINT) AS bin_id
  FROM cum
)
SELECT bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
  CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM binned
GROUP BY bin_id
"""


@register("pack_sequences", _PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget chunking: walk the manifest in doc_id order and cut a
    new bin every _BIN_TOKENS tokens of running total (a doc spanning the
    boundary lands in the later bin).  Output is the shard manifest:
    bin -> doc range + token count.

    The running total is the standard two-pass prefix sum
    (functions/prefix.py): range-partition on doc_id, per-partition
    running sums, n_partitions offsets broadcast back — no global-order
    window, so the manifest pass scales with the cluster."""
    from go_pulsar_elasticsearch_spark.functions.prefix import global_running_sum

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).cast("bigint")
    cum = global_running_sum(
        docs.select("doc_id", n_tokens.alias("n_tokens")),
        [F.col("doc_id")], "n_tokens", "running", "pack_prefix",
    )
    # nonnegative operand keeps Spark floor division and DuckDB's
    # truncating // identical when a zero-token prefix makes running=0
    binned = cum.select(
        "doc_id",
        "n_tokens",
        F.floor(
            F.greatest(F.col("running") - 1, F.lit(0)) / _BIN_TOKENS
        ).alias("bin_id"),
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --------------------------------------------------------------------------
# text_normalize
# --------------------------------------------------------------------------

_NORM_ORACLE = """
SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                      ' +', ' ', 'g')) AS norm_text,
  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                  ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
FROM documents
"""


@register("text_normalize", _NORM_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical pre-tokenization cleanup: lowercase, drop everything
    outside [a-z0-9 ], collapse whitespace runs, trim.  Narrow regex
    pipeline fused into the scan (WholeStageCodegen) — zero shuffle.
    (DuckDB needs the 'g' flag for replace-all; Spark's regexp_replace
    is replace-all by default.)"""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )


# --------------------------------------------------------------------------
# doc_chunk_overlap
# --------------------------------------------------------------------------

_CHUNK_W, _CHUNK_S = 40, 30  # window of 40 words, stride 30 (10-word overlap)

_CHUNK_ORACLE = f"""
SELECT doc_id,
       CAST(floor(s / {_CHUNK_S}) AS BIGINT) AS chunk_id,
       array_to_string(list_slice(string_split(text, ' '), s + 1, s + {_CHUNK_W}), ' ')
         AS chunk_text,
       CAST(len(list_slice(string_split(text, ' '), s + 1, s + {_CHUNK_W})) AS BIGINT)
         AS chunk_words
FROM (
  SELECT doc_id, text,
         unnest(range(0, len(string_split(text, ' ')), {_CHUNK_S})) AS s
  FROM documents
)
"""


@register("doc_chunk_overlap", _CHUNK_ORACLE)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 40-word chunks every 30 words
    (context-window prep for embedding / training pipelines).  Pure
    narrow ops — split once, generate chunk starts with sequence(),
    explode, slice — all inside one WholeStageCodegen stage, zero
    shuffle, so it scales linearly with corpus bytes.  The trailing
    chunk keeps whatever words remain (slice clamps, same as DuckDB's
    list_slice)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    chunked = docs.select(
        "doc_id",
        words.alias("words"),
        F.explode(
            F.sequence(F.lit(0), F.size(words) - 1, F.lit(_CHUNK_S))
        ).alias("s"),
    )
    piece = F.slice(F.col("words"), F.col("s") + 1, _CHUNK_W)
    return chunked.select(
        "doc_id",
        F.floor(F.col("s") / _CHUNK_S).cast("bigint").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("bigint").alias("chunk_words"),
    )


# --------------------------------------------------------------------------
# dataset_card_stats
# --------------------------------------------------------------------------

_CARD_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS en_frac,
       CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
         AS BIGINT) AS total_words,
       1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*) AS dup_rate
FROM documents
GROUP BY source
"""


@register("dataset_card_stats", _CARD_ORACLE)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source "dataset card" rollup: volume (docs/chars/words),
    language spread, and exact-duplicate rate in one pass — the summary
    table every corpus release ships with.

    ONE shuffle on `source`; word counts are per-row array arithmetic
    (no explode), the dup rate rides the same groupBy via a distinct
    count over md5(text), and every division is exact integer->double."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    words = F.size(
        F.filter(F.split("text", " "), lambda x: x != "")
    ).cast("bigint")
    base = docs.select(
        "source", "lang", "n_chars", words.alias("n_words"), F.md5("text").alias("h")
    )
    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
        (
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("en_frac"),
        F.sum("n_words").alias("total_words"),
        (
            F.lit(1.0) - F.countDistinct("h").cast("double") / F.count("*")
        ).alias("dup_rate"),
    )


# --------------------------------------------------------------------------
# sft_format_pairs  (instruction-tuning data prep: prompt/completion +
# chat-template rendering + per-field token budgets)
# --------------------------------------------------------------------------

_SFT_PROMPT_WORDS = 20

_SFT_ORACLE = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), split AS (
  SELECT doc_id,
    array_to_string(w[1 : {_SFT_PROMPT_WORDS}], ' ') AS prompt,
    array_to_string(w[{_SFT_PROMPT_WORDS} + 1 : len(w)], ' ') AS completion,
    len(w) AS n_words
  FROM words
  WHERE len(w) > {_SFT_PROMPT_WORDS}
)
SELECT doc_id, prompt, completion,
  '<|user|>' || chr(10) || prompt || chr(10)
    || '<|assistant|>' || chr(10) || completion AS rendered,
  CAST({_SFT_PROMPT_WORDS} AS BIGINT) AS prompt_tokens,
  CAST(n_words - {_SFT_PROMPT_WORDS} AS BIGINT) AS completion_tokens
FROM split
"""


@register("sft_format_pairs", _SFT_ORACLE)
def sft_format_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT data prep: split each doc into a prompt (first 20 words) and
    completion (rest), render the chat template, and account tokens per
    field (the packing/trucation budget).  Pure zero-shuffle string/array
    expressions — at any scale this pipelines inside the scan stage."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    split = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") > _SFT_PROMPT_WORDS)
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice("w", 1, _SFT_PROMPT_WORDS)).alias("prompt"),
            F.concat_ws(
                " ",
                F.expr(
                    f"slice(w, {_SFT_PROMPT_WORDS + 1},"
                    f" size(w) - {_SFT_PROMPT_WORDS})"
                ),
            ).alias("completion"),
            F.size("w").alias("n_words"),
        )
    )
    rendered = F.concat(
        F.lit("<|user|>\n"), F.col("prompt"),
        F.lit("\n<|assistant|>\n"), F.col("completion"),
    )
    return split.select(
        "doc_id",
        "prompt",
        "completion",
        rendered.alias("rendered"),
        F.lit(_SFT_PROMPT_WORDS).cast("long").alias("prompt_tokens"),
        (F.col("n_words") - _SFT_PROMPT_WORDS).cast("long").alias(
            "completion_tokens"
        ),
    )


# --------------------------------------------------------------------------
# dpo_pair_construction  (preference pairs: best vs worst doc per source
# by the quality heuristic)
# --------------------------------------------------------------------------

_DPO_ORACLE = """
WITH scored AS (
  SELECT doc_id, source, text, n_chars,
    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
      AS rk_best,
    row_number() OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id)
      AS rk_worst
  FROM documents
)
SELECT b.source,
       b.doc_id AS chosen_id, b.text AS chosen,
       w.doc_id AS rejected_id, w.text AS rejected,
       CAST(b.n_chars - w.n_chars AS BIGINT) AS quality_margin
FROM (SELECT * FROM scored WHERE rk_best = 1) b
JOIN (SELECT * FROM scored WHERE rk_worst = 1) w USING (source)
WHERE b.doc_id <> w.doc_id
"""


@register("dpo_pair_construction", _DPO_ORACLE)
def dpo_pair_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction (DPO/RLHF data prep): per source,
    pair the highest-quality doc (longest; ties by id) with the lowest
    as (chosen, rejected), carrying the quality margin.  Both ranks ride
    ONE source-partitioned sort pair; the self-join is per-source 1x1."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    wb = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ww = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    scored = docs.select(
        "doc_id", "source", "text", "n_chars",
        F.row_number().over(wb).alias("rk_best"),
        F.row_number().over(ww).alias("rk_worst"),
    )
    b = scored.filter(F.col("rk_best") == 1).select(
        "source",
        F.col("doc_id").alias("chosen_id"),
        F.col("text").alias("chosen"),
        F.col("n_chars").alias("b_chars"),
    )
    w = scored.filter(F.col("rk_worst") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("text").alias("rejected"),
        F.col("n_chars").alias("w_chars"),
    )
    return (
        b.join(w, "source")
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "source", "chosen_id", "chosen", "rejected_id", "rejected",
            (F.col("b_chars") - F.col("w_chars")).cast("long").alias(
                "quality_margin"
            ),
        )
    )


# --------------------------------------------------------------------------
# bpe_merge_stats  (tokenizer training: the first BPE merge's pair table)
# --------------------------------------------------------------------------

_BPE_TOPN = 10

_BPE_ORACLE = f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS wd FROM documents
), pairs AS (
  SELECT substr(wd, i, 2) AS pair
  FROM (SELECT wd, unnest(range(1, len(wd))) AS i
        FROM words WHERE len(wd) >= 2)
)
SELECT pair, CAST(n AS BIGINT) AS n, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT pair, COUNT(*) AS n,
         row_number() OVER (ORDER BY COUNT(*) DESC, pair) AS rk
  FROM pairs GROUP BY pair
)
WHERE rk <= {_BPE_TOPN}
"""


@register("bpe_merge_stats", _BPE_ORACLE)
def bpe_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training's inner loop, distributed: corpus-weighted
    adjacent-character-pair frequencies (the statistic BPE maximizes;
    rank 1 IS the first merge).  Pairs are built in-row with one
    transform over character offsets — a single explode, one
    pair-keyed count (map-side combined; the alphabet bounds the key
    space), and a rank over the tiny pair table.  Iterating merges =
    re-running this over the re-segmented corpus; each round is the
    same single-shuffle plan."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    pairs = (
        docs.select(F.explode(F.split("text", " ")).alias("wd"))
        .filter(F.length("wd") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(wd) - 1),"
                    " i -> substr(wd, i, 2))"
                )
            ).alias("pair")
        )
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    rk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("pair")))
    return (
        counts.withColumn("rk", rk.cast("int"))
        .filter(F.col("rk") <= _BPE_TOPN)
        .select("pair", "n", "rk")
    )


# --------------------------------------------------------------------------
# seeded_shuffle_shards  (the write-order stage: deterministic global
# shuffle + shard assignment before training consumes the corpus)
# --------------------------------------------------------------------------

_SHUFFLE_SEED = "epoch-0"
_N_SHARDS = 8

_SHUFFLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source,
         md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
), sharded AS (
  SELECT doc_id, source, skey,
         CAST((strpos('0123456789abcdef', substr(skey, 1, 1)) - 1) % {_N_SHARDS}
              AS INTEGER) AS shard
  FROM keyed
)
SELECT doc_id, source, skey, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)
            AS BIGINT) AS pos_in_shard
FROM sharded
"""


@register("seeded_shuffle_shards", _SHUFFLE_ORACLE)
def seeded_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: order by md5(seed:doc_id) — a
    reproducible pseudo-random permutation, re-rollable by changing the
    seed per epoch — with shard assignment from the key's first nibble
    and a per-shard position.  This is the stage that fixes training
    data ORDER: global sorts don't scale, so the order is (shard,
    pos_in_shard), each shard sorted independently after one hash-key
    shuffle — exactly how sharded training data is laid out on disk.

    No rand()/shuffle() anywhere: the permutation is a pure function of
    (seed, doc_id), so re-runs, retries, and the oracle all agree."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    skey = F.md5(F.concat(F.lit(f"{_SHUFFLE_SEED}:"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", "source", skey.alias("skey"))
    shard = (
        (F.instr(F.lit("0123456789abcdef"), F.substring("skey", 1, 1)) - 1)
        % _N_SHARDS
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        keyed.withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
    )


# --------------------------------------------------------------------------
# span_corruption_prep  (T5/UL2 denoising-objective preparation)
# --------------------------------------------------------------------------

# Span corruption turns each document into an (input, target) pair:
# deterministic spans of words are replaced by numbered sentinels in the
# INPUT, and the TARGET lists each sentinel followed by the words it
# hid.  T5 samples spans randomly; here span STARTS are md5-positioned
# (bucket(doc_id:pos) < 13/256 ~ 5% of positions, span length 3 ->
# ~15% corruption, the T5 operating point) so the pair set is
# replay-identical with no RNG state — the same determinism stance as
# split_train_test.  The certified hash covers the fully REASSEMBLED
# input and target strings, not just counts.
_SC_START_LT = 13   # span-start bucket threshold (~5% of positions)
_SC_SPAN = 3        # words hidden per span start


def _sc_start_sql(p: str) -> str:
    """DuckDB: does position ``p`` start a corruption span?"""
    s = f"md5(CAST(doc_id AS VARCHAR) || ':' || CAST({p} AS VARCHAR))"
    return (
        f"({p} >= 1 AND (strpos('{_HEX}', substr({s}, 1, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({s}, 2, 1)) - 1) < {_SC_START_LT})"
    )


_SC_MASK_SQL = " OR ".join(_sc_start_sql(f"pos - {j}") for j in range(_SC_SPAN))
_SC_PREV_MASK_SQL = " OR ".join(
    _sc_start_sql(f"pos - 1 - {j}") for j in range(_SC_SPAN)
)

_SC_ORACLE = f"""
WITH words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
flagged AS (
  SELECT doc_id, word, pos,
         ({_SC_MASK_SQL}) AS mask,
         ({_SC_MASK_SQL}) AND NOT ({_SC_PREV_MASK_SQL})
           AS run_start
  FROM words
),
numbered AS (
  SELECT *, SUM(CASE WHEN run_start THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS sentinel_id
  FROM flagged
),
input_toks AS (
  SELECT doc_id, pos * 2 AS k, word AS tok FROM numbered WHERE NOT mask
  UNION ALL
  SELECT doc_id, pos * 2 - 1,
         '<extra_id_' || CAST(sentinel_id AS VARCHAR) || '>'
  FROM numbered WHERE run_start
),
target_toks AS (
  SELECT doc_id, pos * 2 AS k, word AS tok FROM numbered WHERE mask
  UNION ALL
  SELECT doc_id, pos * 2 - 1,
         '<extra_id_' || CAST(sentinel_id AS VARCHAR) || '>'
  FROM numbered WHERE run_start
),
stats AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN mask THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sentinels
  FROM numbered GROUP BY doc_id
)
SELECT s.doc_id, s.n_masked, s.n_sentinels,
       md5(coalesce(i.txt, '')) AS input_md5,
       md5(coalesce(tg.txt, '')) AS target_md5
FROM stats s
LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY k) AS txt
           FROM input_toks GROUP BY doc_id) i ON i.doc_id = s.doc_id
LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY k) AS txt
           FROM target_toks GROUP BY doc_id) tg ON tg.doc_id = s.doc_id
"""


def _sc_start_col(p) -> F.Column:
    s = F.md5(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), p.cast("string")
        )
    )
    d1 = F.instr(F.lit(_HEX), F.substring(s, 1, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(s, 2, 1)) - 1
    return (p >= 1) & ((d1 * 16 + d2) < _SC_START_LT)


@register("span_corruption_prep", _SC_ORACLE)
def span_corruption_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption with md5-positioned spans: emits per doc
    the masked-word and sentinel counts plus md5 hashes of the fully
    reassembled input (sentinels in place of spans) and target
    (sentinel -> hidden words) strings.

    Plan: one posexplode (narrow), every mask/run-start flag a per-row
    expression (span membership = OR over the 3 possible starts — no
    lag), ONE window for sentinel numbering, and the reassembly groupBys
    reuse the same doc_id partitioning (Catalyst reuses the exchange).
    At 100 TB the cost is two doc_id-keyed passes over the token
    stream."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "word"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")

    mask = None
    for j in range(_SC_SPAN):
        c = _sc_start_col(F.col("pos") - j)
        mask = c if mask is None else (mask | c)
    prev_mask = None
    for j in range(_SC_SPAN):
        c = _sc_start_col(F.col("pos") - 1 - j)
        prev_mask = c if prev_mask is None else (prev_mask | c)

    flagged = words.select(
        "doc_id",
        "pos",
        "word",
        mask.alias("mask"),
        (mask & ~prev_mask).alias("run_start"),
    )
    from pyspark.sql import Window

    numbered = flagged.withColumn(
        "sentinel_id",
        F.sum(F.when(F.col("run_start"), 1).otherwise(0)).over(
            Window.partitionBy("doc_id").orderBy("pos")
        ),
    )
    sentinel_tok = F.concat(
        F.lit("<extra_id_"), F.col("sentinel_id").cast("string"), F.lit(">")
    )
    # one token frame, flagged per destination, so counts AND both
    # reassemblies fold in a SINGLE doc_id aggregate — no three-way
    # self-join of the same lineage (whose "doc_id" equi-conditions
    # Spark can mis-resolve into trivially-true self-join predicates;
    # observed as duplicated output rows before this restructuring)
    toks = (
        numbered.filter(~F.col("mask"))
        .select(
            "doc_id",
            (F.col("pos") * 2).alias("k"),
            F.col("word").alias("tok"),
            F.lit(True).alias("in_input"),
            F.lit(False).alias("in_target"),
            F.lit(False).alias("is_masked_word"),
            F.lit(False).alias("is_sentinel"),
        )
        .unionByName(
            numbered.filter("mask").select(
                "doc_id",
                (F.col("pos") * 2).alias("k"),
                F.col("word").alias("tok"),
                F.lit(False).alias("in_input"),
                F.lit(True).alias("in_target"),
                F.lit(True).alias("is_masked_word"),
                F.lit(False).alias("is_sentinel"),
            )
        )
        .unionByName(
            numbered.filter("run_start").select(
                "doc_id",
                (F.col("pos") * 2 - 1).alias("k"),
                sentinel_tok.alias("tok"),
                F.lit(True).alias("in_input"),
                F.lit(True).alias("in_target"),
                F.lit(False).alias("is_masked_word"),
                F.lit(True).alias("is_sentinel"),
            )
        )
    )

    def _joined(flag: str) -> F.Column:
        return F.array_join(
            F.expr(
                f"transform(array_sort(collect_list("
                f"CASE WHEN {flag} THEN struct(k, tok) END)), s -> s.tok)"
            ),
            " ",
        )

    return toks.groupBy("doc_id").agg(
        F.sum(F.when(F.col("is_masked_word"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_masked"),
        F.sum(F.when(F.col("is_sentinel"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sentinels"),
        F.md5(_joined("in_input")).alias("input_md5"),
        F.md5(_joined("in_target")).alias("target_md5"),
    )


# --------------------------------------------------------------------------
# fim_transform  (fill-in-the-middle pretraining preparation)
# --------------------------------------------------------------------------

# FIM (Bavarian et al., "Efficient Training of Language Models to Fill
# in the Middle") rewrites a document into prefix/middle/suffix with
# sentinels so a causal LM learns infilling: PSM emits
# <PRE>prefix<SUF>suffix<MID>middle, SPM emits
# <SUF>suffix<PRE>prefix<MID>middle.  The split points are
# md5-positioned (house determinism stance, cf. span_corruption_prep /
# split_train_test): p1 falls in the first third of the doc, p2 in the
# last third, so the middle always spans the center and is never empty.
# Mode is doc_id parity (~50/50 PSM/SPM, the paper's joint training
# mix).  The certified hash covers the ENTIRE transformed string.
_FIM_MIN_CHARS = 40


def _fim_u16_sql(salt: str, instr_fn: str) -> str:
    """Hex digits 1-4 of md5(doc_id || ':<salt>') as an int 0..65535 —
    same text both engines modulo the substring-search function name."""
    h = f"md5(CAST(doc_id AS STRING) || ':{salt}')"
    terms = [
        f"(({instr_fn}('{_HEX}', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)})"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


def _fim_sql(instr_fn: str, idiv: str) -> dict[str, str]:
    """The shared FIM expression set; ``idiv`` is the engine's integer
    division token (Spark ``DIV``, DuckDB ``//``)."""
    L = "length(text)"
    third = f"({L} {idiv} 3)"
    p1 = f"(1 + ({_fim_u16_sql('fim1', instr_fn)} % {third}))"
    # p2 in [2L/3 + 1, L): suffix is never empty, middle spans the
    # center third at minimum
    p2 = (
        f"((2 * {L}) {idiv} 3 + 1"
        f" + ({_fim_u16_sql('fim2', instr_fn)}"
        f" % ({L} - (2 * {L}) {idiv} 3 - 1)))"
    )
    pre = f"substr(text, 1, {p1})"
    mid = f"substr(text, {p1} + 1, {p2} - {p1})"
    suf = f"substr(text, {p2} + 1)"
    return {
        "p1": p1,
        "p2": p2,
        "psm": f"('<PRE>' || {pre} || '<SUF>' || {suf} || '<MID>' || {mid})",
        "spm": f"('<SUF>' || {suf} || '<PRE>' || {pre} || '<MID>' || {mid})",
    }


_FIM_D = _fim_sql("strpos", "//")
_FIM_S = _fim_sql("instr", "DIV")

_FIM_ORACLE = f"""
SELECT doc_id, mode, fim_text,
       CAST(length(fim_text) AS BIGINT) AS n_chars_out,
       CAST(n_middle AS BIGINT) AS n_middle
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
         CASE WHEN doc_id % 2 = 0 THEN {_FIM_D["psm"]}
              ELSE {_FIM_D["spm"]} END AS fim_text,
         {_FIM_D["p2"]} - {_FIM_D["p1"]} AS n_middle
  FROM documents
  WHERE length(text) >= {_FIM_MIN_CHARS}
)
"""


@register("fim_transform", _FIM_ORACLE)
def fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle preparation: every doc >= {min} chars is
    rewritten into its FIM form — PSM (<PRE>p<SUF>s<MID>m) for even
    doc_ids, SPM (<SUF>s<PRE>p<MID>m) for odd — with md5-positioned
    split points (p1 in the first third, p2 in the last, so the middle
    is never empty and always covers the doc's center).  Emits the
    full transformed string (hash-certified end-to-end), its length,
    and the middle width.

    Plan: pure per-row string arithmetic fused into the scan — zero
    shuffle, zero UDF; at 100 TB this is the ideal map-only prep shape
    (the downstream pack_sequences pass does the only shuffle)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    eligible = docs.filter(F.length("text") >= _FIM_MIN_CHARS)
    is_psm = F.col("doc_id") % 2 == 0
    fim_text = F.when(is_psm, F.expr(_FIM_S["psm"])).otherwise(
        F.expr(_FIM_S["spm"])
    )
    n_middle = F.expr(f'{_FIM_S["p2"]} - {_FIM_S["p1"]}')
    return eligible.select(
        "doc_id",
        F.when(is_psm, F.lit("psm")).otherwise(F.lit("spm")).alias("mode"),
        fim_text.alias("fim_text"),
        F.length(fim_text).cast("bigint").alias("n_chars_out"),
        n_middle.cast("bigint").alias("n_middle"),
    )


# --------------------------------------------------------------------------
# pack_sequences_bestfit  (best-fit-decreasing bin packing per shard)
# --------------------------------------------------------------------------

# pack_sequences cuts bins by running token total in manifest order —
# zero fragmentation control (a 2047-token doc after a 2000-token
# running point wastes nearly a whole bin).  The packing real training
# pipelines run is bin packing proper: best-fit-DECREASING inside each
# manifest shard — sort the shard's docs by token count descending,
# place each into the fullest open bin that still fits, open a new bin
# otherwise.  BFD is inherently sequential (bin state mutates per item)
# so it runs as a grouped-map pandas UDF per shard: the 100 TB shape is
# thousands of independent shards packing in parallel, with NO
# cross-shard state — exactly how packing shards out on a cluster.
# Rows-only by declaration (sequential heap state is not expressible in
# one SQL statement); tests/test_es_parity4.py re-derives every bin
# from an independent Python BFD and pins the invariants (no overflow,
# token conservation, at-most-one-under-half-full bin per shard, and
# fill >= the sequential cutter's).
_BF_BUDGET = 2048
_BF_SHARD_DOCS = 256


@register("pack_sequences_bestfit")
def pack_sequences_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing sequence packing: shard the manifest
    (doc_id DIV {sd}), BFD-pack each shard's docs into {b}-token bins,
    emit the bin manifest (shard, bin, docs, tokens, fill ratio,
    whether the bin is a single over-budget doc).  Deterministic: the
    (n_tokens DESC, doc_id ASC) placement order and best-fit tie-break
    (fullest bin, lowest index) are total orders.

    Plan: one tokenize pass, one shuffle keyed by shard, then
    applyInPandas per shard (Arrow-batched; bin state never leaves its
    shard) — output is bin-manifest-sized."""
    import pandas as pd

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    ).cast("bigint")
    toks = docs.select(
        "doc_id",
        # integer DIV, not float division: double division loses low
        # bits past 2^53, which could mis-shard synthetic 64-bit ids
        F.expr(f"doc_id DIV {_BF_SHARD_DOCS}").alias("shard"),
        n_tokens.alias("n_tokens"),
    )

    schema = (
        "shard bigint, bin_id int, n_docs bigint, bin_tokens bigint,"
        " fill_ratio double, oversized int"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        loads: list[int] = []
        counts: list[int] = []
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            # best fit: the fullest bin that still fits; ties -> lowest
            # index (max() returns the first maximal element)
            fits = [
                (load, i)
                for i, load in enumerate(loads)
                if load + tok <= _BF_BUDGET
            ]
            if fits:
                _, i = max(fits, key=lambda p: (p[0], -p[1]))
                loads[i] += tok
                counts[i] += 1
            else:
                loads.append(tok)
                counts.append(1)
        shard = int(pdf["shard"].iloc[0])
        return pd.DataFrame(
            {
                "shard": shard,
                "bin_id": range(len(loads)),
                "n_docs": counts,
                "bin_tokens": loads,
                "fill_ratio": [l / _BF_BUDGET for l in loads],
                "oversized": [
                    int(l > _BF_BUDGET) for l in loads
                ],
            }
        )

    return toks.groupBy("shard").applyInPandas(pack, schema)


# --------------------------------------------------------------------------
# mlm_masking_prep  (BERT-style masked-LM preparation, 80/10/10)
# --------------------------------------------------------------------------

# MLM selects ~15% of token positions; of those, 80% become [MASK], 10%
# a random vocabulary token, 10% stay unchanged (the trick that keeps
# the encoder from only attending to [MASK]).  All three decisions are
# md5-positioned (cf. span_corruption_prep): selection byte < 38/256
# ~ 14.8%, action byte < 205 masks (80.1%), < 230 substitutes (9.8%),
# else keeps (10.2%); the substitute token is drawn from the doc's OWN
# token array by a hash-indexed lookup (deterministic; vocabulary-
# distributed the way BERT's random-token branch is).  The certified
# hash covers the fully REASSEMBLED masked text plus the label stream
# (position:original pairs — exactly what the training loss reads).
_MLM_SEL_LT = 38
_MLM_MASK_LT = 205
_MLM_RAND_LT = 230


def _mlm_b256_sql(salt: str, instr_fn: str) -> str:
    """Byte 0..255 from md5(doc_id:pos:salt) — both engines."""
    h = (
        f"md5(CAST(doc_id AS STRING) || ':' || CAST(pos AS STRING)"
        f" || ':{salt}')"
    )
    return (
        f"(({instr_fn}('{_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + ({instr_fn}('{_HEX}', substr({h}, 2, 1)) - 1))"
    )


def _mlm_u16_sql(salt: str, instr_fn: str) -> str:
    """Hex digits 3-6 of the same hash as an int 0..65535 (independent
    of the action byte in digits 1-2)."""
    h = (
        f"md5(CAST(doc_id AS STRING) || ':' || CAST(pos AS STRING)"
        f" || ':{salt}')"
    )
    terms = [
        f"(({instr_fn}('{_HEX}', substr({h}, {3 + i}, 1)) - 1)"
        f" * {16 ** (3 - i)})"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


def _mlm_exprs(instr_fn: str, idx_fn) -> dict[str, str]:
    sel = f"({_mlm_b256_sql('sel', instr_fn)} < {_MLM_SEL_LT})"
    act = _mlm_b256_sql("act", instr_fn)
    repl = idx_fn(f"(({_mlm_u16_sql('act', instr_fn)} % len_w) + 1)")
    tok = (
        f"CASE WHEN NOT {sel} THEN word"
        f" WHEN {act} < {_MLM_MASK_LT} THEN '[MASK]'"
        f" WHEN {act} < {_MLM_RAND_LT} THEN {repl}"
        f" ELSE word END"
    )
    return {
        "sel": sel,
        "is_mask": f"({sel} AND {act} < {_MLM_MASK_LT})",
        "is_rand": f"({sel} AND {act} >= {_MLM_MASK_LT}"
                   f" AND {act} < {_MLM_RAND_LT})",
        "is_keep": f"({sel} AND {act} >= {_MLM_RAND_LT})",
        "tok": tok,
    }


_MLM_D = _mlm_exprs("strpos", lambda i: f"w[{i}]")
_MLM_S = _mlm_exprs("instr", lambda i: f"element_at(w, {i})")

_MLM_ORACLE = f"""
WITH words AS (
  SELECT doc_id, w, len(w) AS len_w,
         unnest(w) AS word,
         unnest(range(1, len(w) + 1)) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), flagged AS (
  SELECT doc_id, pos, word,
         {_MLM_D["tok"]} AS out_tok,
         {_MLM_D["sel"]} AS sel,
         {_MLM_D["is_mask"]} AS is_mask,
         {_MLM_D["is_rand"]} AS is_rand,
         {_MLM_D["is_keep"]} AS is_keep
  FROM words
)
SELECT doc_id,
  md5(string_agg(out_tok, ' ' ORDER BY pos)) AS masked_md5,
  md5(COALESCE(string_agg(
        CASE WHEN sel THEN CAST(pos AS STRING) || ':' || word END,
        ' ' ORDER BY pos), '')) AS labels_md5,
  CAST(SUM(CASE WHEN is_mask THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
  CAST(SUM(CASE WHEN is_rand THEN 1 ELSE 0 END) AS BIGINT) AS n_random,
  CAST(SUM(CASE WHEN is_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM flagged
GROUP BY doc_id
"""


@register("mlm_masking_prep", _MLM_ORACLE)
def mlm_masking_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BERT-style MLM preparation: md5-positioned 15% selection with
    the 80/10/10 mask/random/keep split; emits per doc the md5 of the
    fully reassembled masked token stream, the md5 of the label stream
    (pos:original for every selected position), and the three branch
    counts.  The random-token branch substitutes a hash-indexed token
    from the doc's own array — deterministic and replay-identical.

    Plan: one posexplode carrying the row-local array (narrow — the
    substitute lookup needs it), every flag a per-row expression, one
    doc_id-keyed groupBy whose collect_list reassembles order by
    position (the span_corruption shape).  At 100 TB: one pass over
    the token stream, one doc_id shuffle."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.split("text", " ").alias("w"),
    ).select(
        "doc_id",
        "w",
        F.size("w").alias("len_w"),
        F.posexplode("w").alias("pos0", "word"),
    ).select(
        "doc_id", "w", "len_w", (F.col("pos0") + 1).alias("pos"), "word"
    )
    flagged = words.select(
        "doc_id",
        "pos",
        "word",
        F.expr(_MLM_S["tok"]).alias("out_tok"),
        F.expr(_MLM_S["sel"]).alias("sel"),
        F.expr(_MLM_S["is_mask"]).alias("is_mask"),
        F.expr(_MLM_S["is_rand"]).alias("is_rand"),
        F.expr(_MLM_S["is_keep"]).alias("is_keep"),
    )

    masked = F.array_join(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, out_tok AS v))),"
            " s -> s.v)"
        ),
        " ",
    )
    labels = F.array_join(
        F.expr(
            "transform(array_sort(collect_list(CASE WHEN sel THEN"
            " struct(pos, cast(pos AS STRING) || ':' || word AS v) END)),"
            " s -> s.v)"
        ),
        " ",
    )
    return flagged.groupBy("doc_id").agg(
        F.md5(masked).alias("masked_md5"),
        F.md5(labels).alias("labels_md5"),
        F.sum(F.when(F.col("is_mask"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_masked"),
        F.sum(F.when(F.col("is_rand"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_random"),
        F.sum(F.when(F.col("is_keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )
