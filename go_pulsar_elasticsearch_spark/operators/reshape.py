"""Reshaping + null-handling + time-series-fill operators.

  agg_pivot       — long->wide: order revenue by market segment rows x
                    order-status columns (`groupBy().pivot().agg()`;
                    Catalyst plans it as one aggregation with CASE
                    projections — exactly the oracle's spelling)
  unpivot_melt    — wide->long: part's numeric measures melted to
                    (metric, value) rows (`DataFrame.unpivot`; oracle =
                    UNION ALL, the portable relational spelling)
  na_funcs        — the DataFrameNaFunctions surface: na.fill /
                    na.replace / na.drop against derived nullable
                    columns
  gap_fill_ffill  — time-series regularization: hourly grid per user,
                    left-joined observations, forward-filled with
                    last(ignorenulls) — the resample/ffill every
                    metrics pipeline needs

All four hash-certified vs DuckDB.  Scale notes: pivot with an explicit
value list never collects distinct pivot values to the driver (the
implicit form does — always pass the list); unpivot is a narrow
generate; gap_fill's grid is |users| x |hours| rows built by explode
(never a driver loop) and its fill window shuffles once on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import AVGD, SUMD, davg, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# agg_pivot
# --------------------------------------------------------------------------

_PIVOT_ORACLE = f"""
SELECT
  c.c_mktsegment,
  {SUMD("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice END", 2)}
    AS total_f,
  {SUMD("CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice END", 2)}
    AS total_o,
  {SUMD("CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice END", 2)}
    AS total_p
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


@register("agg_pivot", _PIVOT_ORACLE)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment (rows) x order status (columns).  The
    explicit value list ('F','O','P') matters at scale: without it,
    pivot() first runs a distinct-collect of the column values on the
    driver.  With it, the plan is a single grouped aggregation with
    three conditional sums — identical to the oracle's CASE spelling."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice", 2))
        .select(
            "c_mktsegment",
            F.col("F").alias("total_f"),
            F.col("O").alias("total_o"),
            F.col("P").alias("total_p"),
        )
    )


# --------------------------------------------------------------------------
# unpivot_melt
# --------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE)
FROM part
"""


@register("unpivot_melt", _UNPIVOT_ORACLE)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part's numeric measures melted to (partkey, metric, value) long
    form — DataFrame.unpivot, which Catalyst plans as a generate
    (2 output rows per input, no shuffle, no union re-scan; contrast
    with the oracle's UNION ALL which scans part twice)."""
    tune(spark)
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot(
        ["p_partkey"], ["p_size", "p_retailprice"], "metric", "value"
    )


# --------------------------------------------------------------------------
# na_funcs
# --------------------------------------------------------------------------

# Nullable inputs derived deterministically: negative balances -> NULL
# (then filled to 0), 'error' event types -> NULL (then replaced).

_NA_ORACLE = """
SELECT
  c_custkey,
  COALESCE(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0) AS bal_filled,
  CASE WHEN c_mktsegment = 'MACHINERY' THEN 'HARDWARE'
       ELSE c_mktsegment END AS seg_replaced
FROM customer
WHERE c_name IS NOT NULL
"""


@register("na_funcs", _NA_ORACLE)
def na_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrameNaFunctions surface — na.fill on a derived nullable
    double, na.replace on a string column, na.drop on the key — all
    narrow projections that pipeline with the scan."""
    tune(spark)
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal")).alias("bal_filled"),
        F.col("c_mktsegment").alias("seg_replaced"),
    )
    return (
        c.na.fill({"bal_filled": 0.0})
        .na.replace({"MACHINERY": "HARDWARE"}, subset=["seg_replaced"])
        .na.drop(subset=["c_name"])
        .select("c_custkey", "bal_filled", "seg_replaced")
    )


# --------------------------------------------------------------------------
# gap_fill_ffill
# --------------------------------------------------------------------------

_GRID_START = "2024-01-01 00:00:00"
_GRID_LAST = "2024-01-30 23:00:00"  # inclusive last hour (Spark sequence)
_GRID_END_EX = "2024-01-31 00:00:00"  # exclusive end (DuckDB range)

_GAP_ORACLE = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         {AVGD('value', 2)} AS avg_value
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id, date_trunc('hour', ts)
),
grid AS (
  SELECT u.user_id, g.hour
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (
    SELECT unnest(range(TIMESTAMP '{_GRID_START}',
                        TIMESTAMP '{_GRID_END_EX}',
                        INTERVAL 1 HOUR)) AS hour
  ) g
)
SELECT
  grid.user_id, grid.hour,
  last_value(h.avg_value IGNORE NULLS) OVER (
    PARTITION BY grid.user_id ORDER BY grid.hour
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS value_ffill
FROM grid LEFT JOIN hourly h
  ON h.user_id = grid.user_id AND h.hour = grid.hour
"""


@register("gap_fill_ffill", _GAP_ORACLE)
def gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize purchase activity to an hourly grid per user and
    forward-fill gaps — resample/ffill.  The grid is
    explode(sequence(...)) per user (never a driver loop); the fill is
    one last(ignorenulls) window sharing the user_id partitioning with
    the left join, so the whole op costs two shuffles (hourly agg,
    user window) regardless of data volume.  Hours before a user's
    first purchase stay NULL — the honest choice."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(davg("value", 2).alias("avg_value"))
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.expr(
                    f"sequence(timestamp'{_GRID_START}',"
                    f" timestamp'{_GRID_LAST}', interval 1 hour)"
                )
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .withColumn("value_ffill", F.last("avg_value", ignorenulls=True).over(w))
        .select("user_id", "hour", "value_ffill")
    )
