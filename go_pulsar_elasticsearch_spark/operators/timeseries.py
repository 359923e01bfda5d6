"""Time-series resampling depth: linear interpolation and rolling
quantiles over the `events` stream-shaped table.

  interp_linear — regularize to an hourly grid and LINEARLY interpolate
      interior gaps from the surrounding observations (the numeric
      sibling of gap_fill_ffill's step fill; TimescaleDB's
      `interpolate()` / Pandas `interpolate('time')` semantics).
  rolling_p90   — exact trailing-window 90th percentile per user
      (tail-latency style monitoring; the order-statistic sibling of
      moving_median).

Both deterministic and fully oracled: hourly means use the exact
decimal trick, interpolation arithmetic is written as the identical
IEEE expression in both engines, and the rolling quantile is an exact
order statistic (sort the frame, index it), not an approximation.

100 TB posture: interp_linear is the gap_fill plan plus three more
window columns over the SAME (user_id, hour) window — still two
shuffles total (hourly agg, per-user window); grids explode per user in
the executors, never on the driver.  rolling_p90's frame is bounded (9
rows), so the sorted-array state is O(frame), and the only shuffle is
the per-user window partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import AVGD, davg
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_GRID_START = "2024-01-01 00:00:00"
_GRID_LAST = "2024-01-30 23:00:00"  # inclusive last hour (Spark sequence)
_GRID_END_EX = "2024-01-31 00:00:00"  # exclusive end (DuckDB range)

# --------------------------------------------------------------------------
# interp_linear
# --------------------------------------------------------------------------

_INTERP_ORACLE = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         {AVGD('value', 2)} AS avg_value
  FROM events
  WHERE event_type = 'click'
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
),
j AS (
  SELECT grid.user_id, grid.hour, h.avg_value
  FROM grid LEFT JOIN hourly h
    ON h.user_id = grid.user_id AND h.hour = grid.hour
),
f AS (
  SELECT user_id, hour, avg_value,
    last_value(avg_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN avg_value IS NOT NULL THEN hour END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(avg_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN avg_value IS NOT NULL THEN hour END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY hour
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM j
)
SELECT user_id, hour,
  CASE
    WHEN avg_value IS NOT NULL THEN avg_value
    WHEN pv IS NULL OR nv IS NULL THEN NULL
    ELSE pv + (nv - pv) *
         (CAST(epoch(hour) - epoch(ph) AS DOUBLE)
          / CAST(epoch(nh) - epoch(ph) AS DOUBLE))
  END AS value_interp
FROM f
"""


@register("interp_linear", _INTERP_ORACLE)
def interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid per user; interior gaps filled by linear interpolation
    between the nearest observations on either side.  Four ignore-nulls
    window columns share ONE (user_id, hour) sort; edges (before first /
    after last observation) stay NULL — extrapolation is a policy
    decision, not a default."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "click")
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
    back = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward fill is a running last() over the REVERSED sort, not a
    # first() over a (current row -> unbounded following) frame: Spark
    # evaluates shrinking frames by re-scanning the remainder per row —
    # O(n^2) per partition (23 s at sf0.1 vs 0.6 s for this shape).
    # Both spellings are semantically identical; the oracle keeps the
    # textbook FOLLOWING form since DuckDB evaluates it linearly.
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_hour = F.when(F.col("avg_value").isNotNull(), F.col("hour"))
    f = (
        grid.join(hourly, ["user_id", "hour"], "left")
        .withColumn("pv", F.last("avg_value", ignorenulls=True).over(back))
        .withColumn("ph", F.last(obs_hour, ignorenulls=True).over(back))
        .withColumn("nv", F.last("avg_value", ignorenulls=True).over(fwd))
        .withColumn("nh", F.last(obs_hour, ignorenulls=True).over(fwd))
    )
    ratio = (
        (F.unix_timestamp("hour") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * ratio)
    )
    return f.select("user_id", "hour", interp.alias("value_interp"))


# --------------------------------------------------------------------------
# rolling_p90
# --------------------------------------------------------------------------

_FRAME = 8  # trailing frame: 8 preceding + current = up to 9 rows

_P90_ORACLE = f"""
WITH arrs AS (
  SELECT user_id, ts, event_id,
    list_sort(list(value) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN {_FRAME} PRECEDING AND CURRENT ROW)) AS arr
  FROM events
)
SELECT user_id, ts,
  arr[CAST(ceil(0.9 * len(arr)) AS BIGINT)] AS p90
FROM arrs
"""


@register("rolling_p90", _P90_ORACLE)
def rolling_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing 90th percentile (upper order statistic, ceil rule)
    of `value` over the last 9 events per user.  collect_list over a
    bounded frame + array_sort + index — exact, no sketch; one window
    shuffle on user_id."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_FRAME, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    return (
        ev.withColumn("arr", arr)
        .select(
            "user_id",
            "ts",
            F.expr("element_at(arr, int(ceil(0.9 * size(arr))))").alias("p90"),
        )
    )
