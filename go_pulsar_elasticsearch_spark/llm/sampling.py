"""Sampling + term-weighting operators for corpus balancing and
keyword analysis.

  stratified_sample — deterministic per-stratum sampling (top-n by
                      md5(doc_id) within each `source`), with the
                      inverse-probability weight a downstream estimator
                      needs.  The md5 ordering is the distributed,
                      re-runnable analog of ORDER BY random(): adding
                      executors or re-running never changes the sample.
  tfidf_keywords    — top-3 terms per document by tf-idf.  Classic
                      corpus analytics: one grouped count for tf, one
                      distinct-count for df, a broadcast join, and a
                      per-doc top-k window.

Both fully hash-certified vs DuckDB (ln() rounded to 6 decimals before
ranking so both engines rank identical values — the 1-ulp
transcendental divergence rule from functions/exact.py applies to
ordering keys too).

100 TB posture: stratified_sample is one window shuffle on the stratum
key (skew-safe when strata are balanced; salt the window for a
pathological mega-stratum).  tfidf shuffles on (doc, term) then term;
df collapses to vocabulary size, so its join back to tf broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# stratified_sample
# --------------------------------------------------------------------------

_PER_STRATUM = 10

_STRAT_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS stratum_n
  FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
       CAST(stratum_n AS DOUBLE) / {_PER_STRATUM} AS weight
FROM ranked
WHERE rk <= {_PER_STRATUM}
"""


@register("stratified_sample", _STRAT_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Take exactly {n} documents per source stratum, deterministically
    (md5 order), and attach the inverse-probability weight
    (stratum_size / n) so weighted aggregates over the sample remain
    unbiased.  One shuffle on `source`; both window functions share the
    same partitioning, so Catalyst plans a single exchange + sort."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    wc = Window.partitionBy("source")
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wc).alias("stratum_n"),
        )
        .filter(F.col("rk") <= _PER_STRATUM)
        .select(
            "doc_id",
            "source",
            F.col("rk").cast("bigint").alias("rk"),
            (F.col("stratum_n").cast("double") / _PER_STRATUM).alias("weight"),
        )
    )


# --------------------------------------------------------------------------
# tfidf_keywords
# --------------------------------------------------------------------------

_TOP_TERMS = 3

_TFIDF_ORACLE = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_TOP_TERMS}
"""


@register("tfidf_keywords", _TFIDF_ORACLE)
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf.  tf shuffles
    on (doc_id, term); df re-aggregates tf's output (never the raw
    words) down to vocabulary size and broadcasts back; the scalar doc
    count is a 1-row broadcast cross join.  tfidf is rounded to 6
    decimals BEFORE the ranking window so the order — not just the
    output — is bit-identical cross-engine."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # tf rows are already distinct on (doc_id, term), so doc frequency is
    # a plain count — countDistinct here would add a distinct-expand pass
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_TERMS)
        .select("doc_id", "term", "tfidf", F.col("rk").cast("bigint").alias("rk"))
    )


# --------------------------------------------------------------------------
# mixture_weights_temperature
# --------------------------------------------------------------------------

_TAU = 0.7  # temperature for source re-weighting (multilingual-LM standard)

_MIX_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
  FROM documents GROUP BY source
), shared AS (
  SELECT *,
         CAST(n_docs AS DOUBLE) / SUM(CAST(n_docs AS DOUBLE)) OVER () AS share,
         pow(CAST(n_docs AS DOUBLE) / SUM(CAST(n_docs AS DOUBLE)) OVER (),
             1.0 / {_TAU}) AS unnorm
  FROM per_source
)
SELECT source, n_docs, n_chars_total,
       round(share, 6) AS share,
       round(unnorm / SUM(unnorm) OVER (), 6) AS temp_weight,
       round((unnorm / SUM(unnorm) OVER ()) / share, 6) AS upsample_factor
FROM shared
"""


@register("mixture_weights_temperature", _MIX_ORACLE)
def mixture_weights_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source re-weighting (tau=0.7): the data-mixing
    table an LLM training pipeline samples from.  share_i^(1/tau),
    renormalized, flattens the source distribution; upsample_factor is
    the per-source epoch multiplier the sampler applies.

    Shape at scale: one grouped agg collapses the corpus to |sources|
    rows; every window after that runs on that tiny table (single
    partition is fine and Catalyst knows it).  pow() is transcendental,
    so all derived doubles are rounded to 6 decimals on both engines
    before hashing (functions/exact.py rule)."""
    tune(spark)
    per_source = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )
    everything = Window.partitionBy()
    share = F.col("n_docs").cast("double") / F.sum(
        F.col("n_docs").cast("double")
    ).over(everything)
    unnorm = F.pow(share, 1.0 / _TAU)
    weight = unnorm / F.sum(unnorm).over(everything)
    return per_source.select(
        "source",
        "n_docs",
        "n_chars_total",
        F.round(share, 6).alias("share"),
        F.round(weight, 6).alias("temp_weight"),
        F.round(weight / share, 6).alias("upsample_factor"),
    )


# --------------------------------------------------------------------------
# dsir_importance_weights
# --------------------------------------------------------------------------

_DSIR_LANG = "en"  # target distribution = english docs
_DSIR_BUCKETS = 256


_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, term,
         CAST((strpos('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(term), 2, 1)) - 1)
           AS INTEGER) AS b
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term <> ''
), bc AS (
  SELECT b,
         CAST(SUM(CASE WHEN lang = '{_DSIR_LANG}' THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_t,
         COUNT(*) AS cnt_r
  FROM toks GROUP BY b
), tot AS (
  SELECT CAST(SUM(cnt_t) AS BIGINT) AS tot_t,
         CAST(SUM(cnt_r) AS BIGINT) AS tot_r
  FROM bc
), llr AS (
  SELECT b,
         CAST(round(ln(
             (CAST(cnt_t + 1 AS DOUBLE) / CAST(tot_t + {_DSIR_BUCKETS} AS DOUBLE))
           / (CAST(cnt_r + 1 AS DOUBLE) / CAST(tot_r + {_DSIR_BUCKETS} AS DOUBLE))
         ), 6) AS DECIMAL(18,6)) AS llr
  FROM bc CROSS JOIN tot
)
SELECT doc_id, lang, COUNT(*) AS n_tokens,
       CAST(CAST(SUM(l.llr) AS DECIMAL(28,6)) AS DOUBLE) AS dsir_weight
FROM toks JOIN llr l USING (b)
GROUP BY doc_id, lang
"""


@register("dsir_importance_weights", _DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hash every unigram
    into 256 buckets (first two md5 hex digits — the portable recipe from
    llm/corpus.py), estimate add-one-smoothed bucket distributions for
    the target (lang='en') and raw corpora, and score each document by
    the summed log-likelihood ratio of its token buckets.  Downstream
    samplers resample the raw corpus proportional to exp(weight).

    Deterministic end-to-end: the only transcendental (ln of a rational)
    is rounded to 6 decimals per bucket, then summed as exact decimals.

    100 TB posture: the bucket table is 256 rows regardless of corpus
    size — ONE map-side-combined shuffle collapses the corpus to it, and
    it comes back as a broadcast against the token stream; the per-doc
    sum is the only other shuffle (keyed on doc_id, combinable).  This
    is the shape that makes DSIR tractable where per-vocab n-gram LMs
    are not: state is O(buckets), not O(vocab)."""
    tune(spark)
    from go_pulsar_elasticsearch_spark.llm.corpus import _md5_bucket

    docs = t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .withColumn("b", _md5_bucket("term"))
    )
    is_t = F.col("lang") == _DSIR_LANG
    bc = toks.groupBy("b").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("cnt_t"),
        F.count("*").alias("cnt_r"),
    )
    tot = bc.agg(
        F.sum("cnt_t").alias("tot_t"), F.sum("cnt_r").alias("tot_r")
    )
    p_t = (F.col("cnt_t") + 1).cast("double") / (
        F.col("tot_t") + _DSIR_BUCKETS
    ).cast("double")
    p_r = (F.col("cnt_r") + 1).cast("double") / (
        F.col("tot_r") + _DSIR_BUCKETS
    ).cast("double")
    llr = bc.crossJoin(F.broadcast(tot)).select(
        "b", F.round(F.log(p_t / p_r), 6).cast("decimal(18,6)").alias("llr")
    )
    return (
        toks.join(F.broadcast(llr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("llr").cast("decimal(28,6)").cast("double").alias("dsir_weight"),
        )
        .select("doc_id", "lang", "n_tokens", "dsir_weight")
    )
