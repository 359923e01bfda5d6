"""ES bucket-aggregation parity, part 2: filters (named buckets +
other_bucket) and diversified_sampler.

  filters_agg             — ES `filters` aggregation: independently
                            evaluated named filters (buckets may
                            overlap) plus the `other_bucket` of
                            documents matching none.
  sampler_diversified_agg — ES `diversified_sampler`: the best
                            `shard_size` documents by a score field,
                            de-duplicated to at most
                            `max_docs_per_value` per diversity key —
                            the "don't let one source dominate the
                            sample" agg.

100 TB posture: filters_agg is ONE conditional full-scan aggregate (a
single row of counters, map-side combined) unpivoted to bucket rows —
never one scan per filter; the diversified sampler is one window rank
per diversity key (single shuffle on the key) followed by a global
TakeOrderedAndProject over the per-key survivors (|keys| x
max_docs_per_value rows, never the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# filters_agg  (named filter buckets + other_bucket, one scan)
# --------------------------------------------------------------------------

# Two OVERLAPPING named filters (ES evaluates each independently — a doc
# can land in both) and the other_bucket for docs matching neither.
_FILTERS = {
    "short": "n_chars < 300",
    "en_long": "lang = 'en' AND n_chars >= 700",
}

_FILTERS_ORACLE = f"""
WITH m AS (
  SELECT
    CAST(SUM(CASE WHEN {_FILTERS['short']} THEN 1 ELSE 0 END) AS BIGINT)
      AS c_short,
    CAST(SUM(CASE WHEN {_FILTERS['short']} THEN n_chars ELSE 0 END)
         AS BIGINT) AS s_short,
    CAST(SUM(CASE WHEN {_FILTERS['en_long']} THEN 1 ELSE 0 END) AS BIGINT)
      AS c_en_long,
    CAST(SUM(CASE WHEN {_FILTERS['en_long']} THEN n_chars ELSE 0 END)
         AS BIGINT) AS s_en_long,
    CAST(SUM(CASE WHEN NOT ({_FILTERS['short']})
                   AND NOT ({_FILTERS['en_long']}) THEN 1 ELSE 0 END)
         AS BIGINT) AS c_other,
    CAST(SUM(CASE WHEN NOT ({_FILTERS['short']})
                   AND NOT ({_FILTERS['en_long']}) THEN n_chars ELSE 0 END)
         AS BIGINT) AS s_other
  FROM documents
)
SELECT 'short' AS bucket, c_short AS doc_count, s_short AS sum_chars FROM m
UNION ALL
SELECT 'en_long', c_en_long, s_en_long FROM m
UNION ALL
SELECT '_other_', c_other, s_other FROM m
"""


@register("filters_agg", _FILTERS_ORACLE)
def filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``filters`` aggregation: two independently-evaluated named
    buckets (overlap allowed — each filter is its own predicate, not a
    partition) plus ``other_bucket`` for documents matching neither,
    each carrying doc_count and a sum metric.

    ONE conditional full-scan aggregate builds a single counter row
    (map-side combined — never one scan per filter, which is also how
    ES evaluates the agg: every doc visits every filter once); the
    bucket rows are a 3-row stack unpivot of that frame.  Counts and
    integer sums only, so the hash is exact by construction."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    short = F.expr(_FILTERS["short"])
    en_long = F.expr(_FILTERS["en_long"])
    other = ~short & ~en_long
    m = docs.agg(
        *[
            agg.alias(name)
            for cond, key in ((short, "short"), (en_long, "en_long"),
                              (other, "other"))
            for agg, name in (
                (F.sum(F.when(cond, 1).otherwise(0)), f"c_{key}"),
                (
                    F.sum(F.when(cond, F.col("n_chars")).otherwise(0)),
                    f"s_{key}",
                ),
            )
        ]
    )
    return m.selectExpr(
        "stack(3, 'short', c_short, s_short,"
        " 'en_long', c_en_long, s_en_long,"
        " '_other_', c_other, s_other)"
        " AS (bucket, doc_count, sum_chars)"
    )


# --------------------------------------------------------------------------
# sampler_diversified_agg  (ES diversified_sampler: capped-per-key top-N)
# --------------------------------------------------------------------------

_DS_SHARD_SIZE = 20
_DS_MAX_PER_VALUE = 2

_DIVERSIFIED_ORACLE = f"""
WITH per_key AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id) AS key_rk
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(key_rk AS INTEGER) AS key_rk,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
  FROM per_key WHERE key_rk <= {_DS_MAX_PER_VALUE}
)
WHERE rk <= {_DS_SHARD_SIZE}
"""


@register("sampler_diversified_agg", _DIVERSIFIED_ORACLE)
def sampler_diversified_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``diversified_sampler``: the top-20 documents by ``n_chars``
    with at most 2 per ``source`` — the sampler that stops one dominant
    key from filling the whole sample before downstream aggs see it.

    One window rank per diversity key (single source-keyed shuffle),
    then the global cut runs over the per-key survivors — a frame of at
    most |sources| x max_docs_per_value rows, so the final
    TakeOrderedAndProject touches key-count rows, never the corpus.
    Both ranks use fully-tiebroken total orders, making the selected
    set deterministic and hash-certifiable."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    wk = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    survivors = (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(wk).alias("key_rk"),
        )
        .filter(F.col("key_rk") <= _DS_MAX_PER_VALUE)
    )
    top = survivors.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(
        _DS_SHARD_SIZE
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    )
    return top.select("doc_id", "source", "n_chars", "key_rk", rk.alias("rk"))


# --------------------------------------------------------------------------
# histogram_empty_buckets  (ES histogram: min_doc_count=0 + extended_bounds)
# --------------------------------------------------------------------------

# ES histogram semantics under min_doc_count=0: every bucket between
# extended_bounds.min and .max materializes, zero-filled when no doc
# lands in it — the shape chart dashboards need (a missing bucket and
# an empty bucket render differently).  Bounds deliberately extend past
# the data's max so the zero-fill path is provably exercised.
_HIST_INTERVAL = 25.0
_HIST_BOUND_LO = 0
_HIST_BOUND_HI = 975  # bucket_lo of the last materialized bucket
_HIST_N = int(_HIST_BOUND_HI / _HIST_INTERVAL)  # 39 -> 40 buckets

_HIST_EMPTY_ORACLE = f"""
WITH buckets AS (
  SELECT CAST(unnest(generate_series(0, {_HIST_N})) AS BIGINT) AS idx
), cnt AS (
  SELECT CAST(floor(value / CAST({_HIST_INTERVAL} AS DOUBLE)) AS BIGINT)
           AS idx,
         CAST(COUNT(*) AS BIGINT) AS c,
         {SUMD('value', 2)} AS s
  FROM events GROUP BY 1
)
SELECT b.idx,
       b.idx * CAST({_HIST_INTERVAL} AS DOUBLE) AS bucket_lo,
       COALESCE(c, 0) AS doc_count,
       COALESCE(s, CAST(0.0 AS DOUBLE)) AS sum_value
FROM buckets b LEFT JOIN cnt ON cnt.idx = b.idx
"""


@register("histogram_empty_buckets", _HIST_EMPTY_ORACLE)
def histogram_empty_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``histogram`` aggregation with ``min_doc_count: 0`` and
    ``extended_bounds``: the FULL bucket lattice [0, 975] at interval
    25 materializes, zero-filled where no event lands (the bounds
    extend past the data's max, so the zero-fill path provably runs).

    Plan: the value histogram is ONE map-side-combined aggregate
    (bucket-count-sized output); the lattice is a literal-range frame
    broadcast-left-joined onto it — the empty-bucket fill costs lattice
    rows, never a scan.  Bucketing is floor(v / interval) in IEEE
    doubles (identical text both engines) and the sum metric rides the
    exact decimal carrier, zero-filled with COALESCE like ES."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    cnt = ev.groupBy(
        F.floor(F.col("value") / F.lit(_HIST_INTERVAL)).alias("idx")
    ).agg(
        F.count("*").alias("c"),
        dsum(F.col("value"), 2).alias("s"),
    )
    buckets = spark.range(0, _HIST_N + 1).select(F.col("id").alias("idx"))
    return (
        buckets.join(cnt, "idx", "left")
        .select(
            "idx",
            (F.col("idx") * F.lit(_HIST_INTERVAL)).alias("bucket_lo"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("doc_count"),
            F.coalesce("s", F.lit(0.0)).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# terms_order_by_subagg  (ES terms agg ordered by a sub-aggregation)
# --------------------------------------------------------------------------

# ES `terms` with `order: {avg_chars: desc}`: buckets ranked by a
# SUB-AGGREGATION's value rather than doc_count — the ES corner with
# a documented accuracy trap (per-shard top-size by a sub-agg can miss
# the true top bucket).  The engine computes the global aggregate
# before the cut, so the selection here is exact — the semantics ES
# users WANT, delivered the way only a full-shuffle engine can.
_TOBS_SIZE = 5

_TOBS_ORACLE = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY source
ORDER BY avg_chars DESC, source
LIMIT {_TOBS_SIZE}
"""


@register("terms_order_by_subagg", _TOBS_ORACLE)
def terms_order_by_subagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``terms`` aggregation ordered by a sub-aggregation metric
    (avg length DESC, size 5) instead of doc_count.  ES documents this
    ordering as potentially INEXACT (each shard nominates its local
    top-size by the sub-agg, and a globally-top bucket can miss every
    shard's nomination); here the bucket aggregate completes before
    the cut — one map-side-combined shuffle to vocabulary-sized bucket
    rows, then TakeOrderedAndProject — so the result is the exact
    answer ES approximates.  The mean is CAST(SUM AS DOUBLE)/COUNT on
    exact integer sums: bit-identical cross-engine."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias(
                "avg_chars"
            ),
        )
        .orderBy(F.desc("avg_chars"), "source")
        .limit(_TOBS_SIZE)
    )


# --------------------------------------------------------------------------
# ip_prefix_agg  (ES ip_prefix: CIDR-block bucketing of IP addresses)
# --------------------------------------------------------------------------

# ES 8.x's `ip_prefix` aggregation buckets documents by the first
# `prefix_length` bits of an ip field.  The fixture tables carry no IPs,
# so each event synthesizes a deterministic IPv4 in 10.0.0.0/8 from its
# own keys (the multimodal/geo synthesis pattern — the construction is
# part of the certified surface): octets from user_id/event_id
# arithmetic.  The /16 bucketing is one integer mask; the dotted-quad
# rendering is shared string arithmetic, so the whole op — synthesis,
# mask, render, count — hash-certifies.
_IPP_LEN = 16  # prefix_length

_IP_INT = (
    "(167772160 + (user_id % 256) * 65536"
    " + (event_id % 256) * 256 + (event_id % 251))"
)


def _ip_prefix_sql(ip: str) -> str:
    """Dotted-quad of the /16 network address + '/16' (identical text
    both engines: >> and % on BIGINT, || concat via concat())."""
    hi = f"({ip} // 16777216)"
    lo = f"(({ip} // 65536) % 256)"
    return (
        f"concat(CAST({hi} AS VARCHAR), '.', CAST({lo} AS VARCHAR),"
        f" '.0.0/{_IPP_LEN}')"
    )


_IP_PREFIX_ORACLE = f"""
SELECT {_ip_prefix_sql(_IP_INT)} AS prefix,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1
"""


@register("ip_prefix_agg", _IP_PREFIX_ORACLE)
def ip_prefix_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``ip_prefix`` aggregation (prefix_length=16): bucket every
    event's synthesized IPv4 into its /16 CIDR block, with doc count
    and distinct-user cardinality per block — the network-traffic
    rollup ES ships it for.

    Plan: the IP synthesis and mask are scan-fused integer expressions;
    one map-side-combined aggregate whose output is bounded by the /16
    universe (at most 256 blocks under the 10.x/16 synthesis).  The
    distinct-user count is the only expanding term and it rides the
    same shuffle."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    ip = (
        "(167772160 + (user_id % 256) * 65536"
        " + (event_id % 256) * 256 + (event_id % 251))"
    )
    prefix = F.expr(
        f"concat(CAST({ip} div 16777216 AS STRING), '.',"
        f" CAST(({ip} div 65536) % 256 AS STRING), '.0.0/{_IPP_LEN}')"
    )
    return ev.groupBy(prefix.alias("prefix")).agg(
        F.count("*").alias("doc_count"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# random_sampler_agg  (ES 8.x random_sampler: probability-sampled aggs
# with scaled estimates — deterministic seeded-hash variant)
# --------------------------------------------------------------------------

_RS_HEX = "0123456789abcdef"
_RS_SEED = 42
_RS_DENOM = 4  # probability = 1/4 -> u16 threshold 16384, scale x4


def _rs_u16(col_sql: str, instr_fn: str) -> str:
    """First 4 md5 hex digits of (seed:key) as an int 0..65535 — the
    geo-family hash idiom with an explicit seed, so re-seeding redraws
    the sample deterministically."""
    terms = []
    for i in range(4):
        terms.append(
            f"(({instr_fn}('{_RS_HEX}', substr(md5(concat('{_RS_SEED}:',"
            f" CAST({col_sql} AS STRING))), {i + 1}, 1)) - 1)"
            f" * {16 ** (3 - i)})"
        )
    return "(" + " + ".join(terms) + ")"


_RANDOM_SAMPLER_ORACLE = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(COUNT(*) * {_RS_DENOM} AS BIGINT) AS est_n_docs,
       CAST(SUM(n_chars) * {_RS_DENOM} AS BIGINT) AS est_total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars_in_sample
FROM (
  SELECT source, n_chars FROM documents
  WHERE {_rs_u16("doc_id", "strpos").replace("substr", "substr")}
        < {65536 // _RS_DENOM}
)
GROUP BY source
"""


@register("random_sampler_agg", _RANDOM_SAMPLER_ORACLE)
def random_sampler_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8.x ``random_sampler``: aggregations computed on a
    probability-p sample with counts scaled back by 1/p.  ES draws the
    sample from a seeded hash stream so it is reproducible per shard;
    the engine-shared analog hashes (seed : doc_id) and keeps documents
    whose first-16-bit hash value falls under p * 65536 — a pure
    function of (seed, doc), so the SAMPLE ITSELF is certified, not
    just its statistics.  p = 1/4 keeps the scale factor integral (the
    estimate columns stay exact bigints).

    Scale shape: the sample predicate is scan-fused (one md5 per row,
    no shuffle to sample); the survivors take one map-side-combined
    bucket aggregate.  This is the agg ES ships for "dashboards over
    billions of docs at 1% cost" — precisely the 100 TB use."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    sampled = docs.filter(
        F.expr(_rs_u16("doc_id", "instr")) < 65536 // _RS_DENOM
    )
    return sampled.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        (F.count("*") * _RS_DENOM).cast("bigint").alias("est_n_docs"),
        (F.sum("n_chars") * _RS_DENOM).cast("bigint").alias(
            "est_total_chars"
        ),
        (F.sum("n_chars").cast("double") / F.count("*")).alias(
            "avg_chars_in_sample"
        ),
    )
