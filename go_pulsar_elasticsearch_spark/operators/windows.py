"""Window-function operators (SURVEY.md §2B).

Window ops shuffle once on partitionBy keys then sort within partitions;
there is no global sort.  At 100 TB the key design rule is: partition keys
must have enough cardinality to spread (custkey/user_id do); a window with
no partitionBy forces a single-task global sort and is forbidden on data
paths here.

Determinism: every ORDER BY carries a unique tie-break key so ranks and
frame contents are reproducible across engines; running sums use the
exact-decimal trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import register_views, t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# win_ranking
# --------------------------------------------------------------------------

_RANKING_ORACLE = """
SELECT * FROM (
  SELECT
    o_custkey,
    o_orderkey,
    o_totalprice,
    CAST(row_number() OVER w AS INTEGER) AS rn,
    CAST(rank() OVER w AS INTEGER) AS rnk,
    CAST(dense_rank() OVER w AS INTEGER) AS drnk,
    CAST(ntile(4) OVER w AS INTEGER) AS quartile
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
"""


@register("win_ranking", _RANKING_ORACLE)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile: top-3 orders per customer."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# win_analytic  (lag/lead/first/last)
# --------------------------------------------------------------------------

_ANALYTIC_ORACLE = """
SELECT
  user_id,
  event_id,
  event_type,
  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
  CAST(epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS BIGINT) AS ms_since_prev,
  lead(event_type) OVER w AS next_type,
  first_value(event_type) OVER w AS first_type,
  last_value(event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS final_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("win_analytic", _ANALYTIC_ORACLE)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last over per-user event time — inter-event deltas in
    exact epoch-millis (unix_millis ≡ DuckDB epoch_ms, no float time)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ts_ms = F.unix_millis("ts")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        ts_ms.alias("ts_ms"),
        (ts_ms - F.unix_millis(F.lag("ts").over(w))).alias("ms_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("final_type"),
    )


# --------------------------------------------------------------------------
# win_frame_agg  (running / sliding frames)
# --------------------------------------------------------------------------

_FRAME_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  date_trunc('day', o_orderdate) AS o_date,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS running_spend,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS spend_3,
  CAST(COUNT(*) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS n_3
FROM orders
"""


@register("win_frame_agg", _FRAME_ORACLE)
def win_frame_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + 3-row sliding sums per customer (exact decimal frames)."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    ordering = [F.asc("o_orderdate"), F.asc("o_orderkey")]
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_3 = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(-2, Window.currentRow)
    )
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_trunc("day", "o_orderdate").alias("o_date"),
        F.sum(price_dec).over(w_run).cast("double").alias("running_spend"),
        F.sum(price_dec).over(w_3).cast("double").alias("spend_3"),
        F.count("*").over(w_3).alias("n_3"),
    )


# --------------------------------------------------------------------------
# win_range_interval  (time-RANGE frame: INTERVAL n DAY PRECEDING)
# --------------------------------------------------------------------------

# The identical statement runs on both engines (standard WINDOW clause +
# RANGE INTERVAL frame).  Exact-decimal sum inside the frame, double out
# — RANGE peers (equal ts) are included by both engines per the SQL
# standard, and the decimal accumulation makes the sum order-free.
_RANGE_INTERVAL_SQL = """
SELECT user_id,
       event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
)
"""


@register("win_range_interval", _RANGE_INTERVAL_SQL)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame: per-user rolling 7-DAY event count and
    value sum, `RANGE BETWEEN INTERVAL 7 DAY PRECEDING` — the frame is
    bounded by the ORDER key's VALUE (event time), not a row count, so
    irregular event spacing is handled exactly (a burst contributes
    many rows, a quiet week contributes none).  ROWS frames
    (win_frame_agg) cannot express this; it is the window-function
    analog of the streaming sliding window.

    Scale: one shuffle on user_id + per-partition sort, identical cost
    shape to every other user-keyed window; the frame bound adds no
    extra exchange."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_RANGE_INTERVAL_SQL)
