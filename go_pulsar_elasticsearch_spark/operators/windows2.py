"""Distribution window functions + exact percentiles + skew-salted join
(SURVEY.md §2B extensions).

The salted join is the pattern that matters at 100 TB: a hot key would
put one shuffle partition orders of magnitude over the others; salting
the hot side and exploding the dim side keeps the result identical (the
oracle is the PLAIN join) while the shuffle spreads over N_SALT
sub-keys.  AQE's skew-join handles moderate skew automatically; salting
is the explicit form for extreme keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# win_distribution  (percent_rank / cume_dist / nth_value)
# --------------------------------------------------------------------------

_DIST_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cum_dist,
  nth_value(o_orderkey, 2) OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS second_best_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("win_distribution", _DIST_ORACLE)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist (rank arithmetic on bigints -> identical
    doubles) and nth_value over the full-partition frame."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*order)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_best_order"),
    )


# --------------------------------------------------------------------------
# agg_percentiles  (exact interpolated percentiles on integral values)
# --------------------------------------------------------------------------

_PCTL_ORACLE = """
SELECT
  l_returnflag,
  quantile_cont(l_quantity, 0.25) AS q25,
  quantile_cont(l_quantity, 0.5) AS q50,
  quantile_cont(l_quantity, 0.75) AS q75,
  CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_percentiles", _PCTL_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort-based).  l_quantity is integral, so linear
    interpolation at k/4 quantiles is exact in both engines.  At scale
    prefer percentile_approx (agg_approx) — this is the exact baseline."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.percentile(q, 0.25).alias("q25"),
        F.percentile(q, 0.5).alias("q50"),
        F.percentile(q, 0.75).alias("q75"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# join_skew_salted
# --------------------------------------------------------------------------

_N_SALT = 8

# Oracle is the PLAIN join: salting must be invisible in the result.
_SALTED_ORACLE = f"""
SELECT
  n.n_name AS nation,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  {SUMD('c.c_acctbal')} AS total_balance
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@register("join_skew_salted", _SALTED_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join: the fact side gets a deterministic salt
    (key % pre-partitioned spread), the dim side is exploded across all
    salts, and the join key becomes (key, salt) — same result as the
    plain join (that's the oracle), but a hot nationkey now spreads over
    {_N_SALT} shuffle partitions."""
    tune(spark)
    c = t(spark, sf_dir, "customer").withColumn(
        "salt", (F.col("c_custkey") % _N_SALT).cast("int")
    )
    n = t(spark, sf_dir, "nation").select(
        "*", F.explode(F.expr(f"sequence(0, {_N_SALT - 1})")).alias("salt")
    )
    return (
        c.join(n, (c.c_nationkey == n.n_nationkey) & (c.salt == n.salt))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_balance"),
        )
    )


# --------------------------------------------------------------------------
# moving_median  (exact rolling median over a fixed odd frame)
# --------------------------------------------------------------------------

_MM_FRAME = 7  # odd on purpose: a full frame's median is an element, not
               # an interpolation -> bit-exact across engines

_MM_ORACLE = f"""
SELECT user_id, event_id, ts, value, mov_median
FROM (
  SELECT user_id, event_id, ts, value,
         median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN {_MM_FRAME - 1} PRECEDING
                                      AND CURRENT ROW) AS mov_median,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn >= {_MM_FRAME}
"""


@register("moving_median", _MM_ORACLE)
def moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust rolling statistic: exact median of the trailing 7 events
    per user — the outlier-resistant smoother ops dashboards want where
    ewma_smooth (mean-based) chases spikes.

    Rows with an incomplete leading frame are dropped, so every emitted
    median is over exactly 7 rows; with an odd frame the exact median IS
    one of the input doubles — no interpolation, no rounding, identical
    in Spark (`percentile(v, 0.5)` window) and DuckDB (`median`).

    100 TB posture: ONE shuffle on user_id; the percentile and the
    row_number share the exchange+sort (same partition/order spec, one
    Window node pair over one sort).  Frame eval is O(frame) per row
    with bounded memory — no whole-partition buffering."""
    tune(spark)
    events = t(spark, sf_dir, "events")
    spec = Window.partitionBy("user_id").orderBy("ts", "event_id")
    med = (
        F.expr("percentile(value, 0.5)")
        .over(spec.rowsBetween(-(_MM_FRAME - 1), 0))
        .alias("mov_median")
    )
    return (
        events.select(
            "user_id", "event_id", "ts", "value", med,
            F.row_number().over(spec).alias("rn"),
        )
        .filter(F.col("rn") >= _MM_FRAME)
        .drop("rn")
    )
