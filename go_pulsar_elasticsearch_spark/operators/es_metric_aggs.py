"""ES metric-aggregation parity, part 2: string_stats, t_test (Welch),
weighted_avg.

Three metric aggregations ES exposes over the fields the reference
indexes (mapping.json makes `name`/`type` text fields and the engine's
`documents.text` is their analog; `value`-bearing event streams are what
t_test/weighted_avg run on in ES dashboards):

  string_stats_agg — ES `string_stats`: per bucket, count / min / max /
                     avg length plus the Shannon entropy (bits) of the
                     character distribution.
  t_test_welch     — ES `t_test` (type=heteroscedastic): Welch's
                     unequal-variance t statistic between two filtered
                     populations, with the Welch–Satterthwaite degrees
                     of freedom.
  weighted_avg_agg — ES `weighted_avg`: sum(value*weight)/sum(weight)
                     per bucket.

Cross-engine exactness: every mean/variance derives from exact decimal
sums (functions.exact — order-independent, so Spark's partition-merge
order and DuckDB's scan order agree bit-for-bit); entropy rides the
established `c * round(log, 6)` decimal-term recipe (text_entropy);
the remaining arithmetic is identically-shaped IEEE double chains.

100 TB posture: string_stats' char explode partial-aggregates to at
most |alphabet| rows per bucket before the shuffle; t_test and
weighted_avg are single map-side-combined aggregates (one conditional
pass, one row / bucket-count rows out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# string_stats_agg  (count / min / max / avg length + char entropy, bits)
# --------------------------------------------------------------------------

_STRING_STATS_ORACLE = """
WITH chars AS (
  SELECT source, substr(text, i, 1) AS ch
  FROM (SELECT source, text, unnest(range(1, length(text) + 1)) AS i
        FROM documents WHERE length(text) > 0)
), cc AS (
  SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS c FROM chars GROUP BY 1, 2
), cn AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cc GROUP BY 1
), ent AS (
  SELECT cc.source,
         -CAST(SUM(CAST(cc.c * round(log2(CAST(cc.c AS DOUBLE) / cn.n), 6)
                        AS DECIMAL(18,6))) AS DOUBLE) / cn.n AS entropy_bits
  FROM cc JOIN cn ON cn.source = cc.source
  GROUP BY cc.source, cn.n
), stats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS doc_count,
         CAST(MIN(length(text)) AS BIGINT) AS min_len,
         CAST(MAX(length(text)) AS BIGINT) AS max_len,
         CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS avg_len
  FROM documents GROUP BY 1
)
SELECT stats.source, doc_count, min_len, max_len, avg_len, entropy_bits
FROM stats JOIN ent ON ent.source = stats.source
"""


@register("string_stats_agg", _STRING_STATS_ORACLE)
def string_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``string_stats`` per ``source`` bucket: doc count, min / max /
    avg text length, and the Shannon entropy (bits — ES reports log2)
    of the bucket's character distribution.

    Scale shape: the length stats are one map-side-combined aggregate;
    the entropy explode is narrow and its (source, char) counts partial-
    aggregate to at most |alphabet| rows per bucket before the shuffle —
    nothing corpus-proportional crosses the wire beyond the scan.  The
    entropy sum rides the exact-decimal recipe (c * round(log2(c/n), 6)
    summed as DECIMAL(18,6)) shared with text_entropy, so the float
    reduction is order-independent and hash-certifiable."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    chars = docs.filter(F.length("text") > 0).select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)),"
                " i -> substring(text, i, 1))"
            )
        ).alias("ch"),
    )
    cc = chars.groupBy("source", "ch").agg(F.count("*").alias("c"))
    cn = cc.groupBy("source").agg(F.sum("c").alias("n"))
    term = F.col("c") * F.round(
        F.log2(F.col("c").cast("double") / F.col("n")), 6
    )
    ent = (
        cc.join(cn, "source")
        .groupBy("source", "n")
        .agg(F.sum(term.cast("decimal(18,6)")).cast("double").alias("_s"))
        .select("source", (-F.col("_s") / F.col("n")).alias("entropy_bits"))
    )
    stats = docs.groupBy("source").agg(
        F.count("*").alias("doc_count"),
        F.min(F.length("text")).cast("bigint").alias("min_len"),
        F.max(F.length("text")).cast("bigint").alias("max_len"),
        (F.sum(F.length("text")).cast("double") / F.count("*")).alias(
            "avg_len"
        ),
    )
    return stats.join(ent, "source")


# --------------------------------------------------------------------------
# t_test_welch  (ES t_test, type=heteroscedastic: Welch's unequal-variance t)
# --------------------------------------------------------------------------

# Two filtered populations of events.value (2-decimal doubles): decimal
# sums at scale 2, sums of squares at scale 4 — both exact.
_TT_A = "purchase"
_TT_B = "error"

_T_TEST_ORACLE = f"""
WITH m AS (
  SELECT
    CAST(SUM(CASE WHEN event_type = '{_TT_A}' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_a,
    CAST(SUM(CASE WHEN event_type = '{_TT_B}' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_b,
    {SUMD(f"CASE WHEN event_type = '{_TT_A}' THEN value END", 2)} AS sa,
    {SUMD(f"CASE WHEN event_type = '{_TT_A}' THEN value * value END",
          4, 18, 4)} AS sqa,
    {SUMD(f"CASE WHEN event_type = '{_TT_B}' THEN value END", 2)} AS sb,
    {SUMD(f"CASE WHEN event_type = '{_TT_B}' THEN value * value END",
          4, 18, 4)} AS sqb
  FROM events
)
SELECT n_a, n_b,
  (sa / n_a) AS mean_a,
  (sb / n_b) AS mean_b,
  ((sa / n_a) - (sb / n_b))
    / sqrt(((sqa - sa * sa / n_a) / (n_a - 1)) / n_a
           + ((sqb - sb * sb / n_b) / (n_b - 1)) / n_b) AS t_stat,
  (((sqa - sa * sa / n_a) / (n_a - 1)) / n_a
    + ((sqb - sb * sb / n_b) / (n_b - 1)) / n_b)
  * (((sqa - sa * sa / n_a) / (n_a - 1)) / n_a
     + ((sqb - sb * sb / n_b) / (n_b - 1)) / n_b)
  / ((((sqa - sa * sa / n_a) / (n_a - 1)) / n_a)
     * (((sqa - sa * sa / n_a) / (n_a - 1)) / n_a) / (n_a - 1)
     + (((sqb - sb * sb / n_b) / (n_b - 1)) / n_b)
       * (((sqb - sb * sb / n_b) / (n_b - 1)) / n_b) / (n_b - 1))
    AS df_welch
FROM m
"""


@register("t_test_welch", _T_TEST_ORACLE)
def t_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``t_test`` aggregation (type=heteroscedastic): Welch's
    unequal-variance t statistic between the `purchase` and `error`
    populations of events.value, with the Welch–Satterthwaite degrees
    of freedom.

    ONE conditional full-scan aggregate produces the 1-row moment frame
    (exact decimal sums — order-independent); the t statistic and df are
    then identically-shaped IEEE double chains on both engines (division
    and sqrt are correctly rounded operations, and x^1.5-style powers
    are avoided), so the whole op is hash-certified with no rounding."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    is_a = F.col("event_type") == _TT_A
    is_b = F.col("event_type") == _TT_B
    m = ev.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
        dsum(F.when(is_a, v), 2).alias("sa"),
        # sums of squares take the widened-decimal accumulator
        # (dsum's own documented rule): the scale-4 long fast path has
        # only ~13x headroom at the 100x replica and would silently
        # wrap on a wider value distribution
        dsum(F.when(is_a, v * v), 4, 18, 4, wide=True).alias("sqa"),
        dsum(F.when(is_b, v), 2).alias("sb"),
        dsum(F.when(is_b, v * v), 4, 18, 4, wide=True).alias("sqb"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    sa, sqa = F.col("sa"), F.col("sqa")
    sb, sqb = F.col("sb"), F.col("sqb")
    # the per-population standard error terms, written ONCE each and in
    # the same association order as the oracle SQL
    se_a = ((sqa - sa * sa / n_a) / (n_a - 1)) / n_a
    se_b = ((sqb - sb * sb / n_b) / (n_b - 1)) / n_b
    se = se_a + se_b
    return m.select(
        "n_a",
        "n_b",
        (sa / n_a).alias("mean_a"),
        (sb / n_b).alias("mean_b"),
        (((sa / n_a) - (sb / n_b)) / F.sqrt(se)).alias("t_stat"),
        (
            se * se / (se_a * se_a / (n_a - 1) + se_b * se_b / (n_b - 1))
        ).alias("df_welch"),
    )


# --------------------------------------------------------------------------
# weighted_avg_agg  (ES weighted_avg: sum(value*weight)/sum(weight))
# --------------------------------------------------------------------------

_WEIGHTED_AVG_ORACLE = f"""
SELECT l_returnflag,
       {SUMD('l_extendedprice * l_quantity', 2)}
         / {SUMD('l_quantity', 2)} AS wavg_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("weighted_avg_agg", _WEIGHTED_AVG_ORACLE)
def weighted_avg_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``weighted_avg``: quantity-weighted average extended price per
    return flag — sum(value*weight)/sum(weight) with both sums on the
    exact decimal carriers (price*qty at scale 2, qty at scale 2), so
    the single closing division is bit-identical cross-engine.  One
    map-side-combined aggregate; output is bucket-count-sized."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        (dsum(p * q, 2) / dsum(q, 2)).alias("wavg_price")
    )
