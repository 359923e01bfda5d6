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


# --------------------------------------------------------------------------
# ts_znorm_subsequence_topk  (UCR-style time-series subsequence search)
# --------------------------------------------------------------------------

# The streaming-TS-similarity primitive (EDBT 2019's problem; also the
# Matrix Profile / UCR-suite core): find the corpus windows whose SHAPE
# best matches a query pattern, i.e. smallest z-normalized Euclidean
# distance between length-m subsequences.  m = 8 keeps the unrolled-lag
# form (the ewma_smooth technique) — every window is one row of 8 lag
# columns, so the whole search is ONE window shuffle + a fixed-order
# arithmetic expression, no self-join, no explode.
#
# Determinism: per-window mean/std/distance are FIXED-ORDER inline
# expressions (never float aggregates), so both engines evaluate the
# identical IEEE tree — the same statement text runs verbatim on Spark
# and DuckDB, and even the double distances hash-match.
_TS_M = 8
_TS_TOPK = 20


def _ts_sql() -> str:
    m = _TS_M
    lags = ",\n         ".join(
        [
            f"LAG(value, {m - 1 - j}) OVER (PARTITION BY user_id"
            f" ORDER BY ts, event_id) AS l{j}"
            for j in range(m - 1)
        ]
        + [f"value AS l{m - 1}"]
    )
    pat = ",\n         ".join(
        f"MAX(CASE WHEN rn = {j + 1} THEN value END) AS q{j}"
        for j in range(m)
    )
    suml = " + ".join(f"l{j}" for j in range(m))
    sumq = " + ".join(f"q{j}" for j in range(m))
    varl = " + ".join(f"(l{j} - ml) * (l{j} - ml)" for j in range(m))
    varq = " + ".join(f"(q{j} - mq) * (q{j} - mq)" for j in range(m))
    zterm = " + ".join(
        f"((l{j} - ml) / sl - (q{j} - mq) / sq)"
        f" * ((l{j} - ml) / sl - (q{j} - mq) / sq)"
        for j in range(m)
    )
    return f"""
WITH anchor_user AS (
  SELECT MIN(user_id) AS au FROM events
),
anchor_seq AS (
  SELECT e.value, ROW_NUMBER() OVER (ORDER BY e.ts, e.event_id) AS rn
  FROM events e CROSS JOIN anchor_user a
  WHERE e.user_id = a.au
),
pattern AS (
  SELECT {pat}
  FROM anchor_seq WHERE rn <= {m}
),
lagged AS (
  SELECT user_id, event_id,
         {lags}
  FROM events
),
cand AS (
  SELECT c.*, p.*
  FROM lagged c CROSS JOIN pattern p CROSS JOIN anchor_user a
  WHERE c.user_id <> a.au AND c.l0 IS NOT NULL
),
norm AS (
  SELECT *, ({suml}) / {m}.0 AS ml, ({sumq}) / {m}.0 AS mq
  FROM cand
),
sd AS (
  SELECT *, sqrt(({varl}) / {m}.0) AS sl, sqrt(({varq}) / {m}.0) AS sq
  FROM norm
)
SELECT user_id, event_id, {zterm} AS zdist
FROM sd
WHERE sl > 0 AND sq > 0
ORDER BY zdist, user_id, event_id
LIMIT {_TS_TOPK}
"""


_TS_SQL = _ts_sql()


@register("ts_znorm_subsequence_topk", _TS_SQL)
def ts_znorm_subsequence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 closest length-8 subsequences to the anchor user's opening
    pattern by z-normalized Euclidean distance — shape matching, so a
    scaled/shifted copy of the pattern still ranks first.  The IDENTICAL
    statement runs on both engines (the oracle IS the query text).

    Plan: one window shuffle builds every subsequence as a lag row,
    the 1-row pattern broadcast-crosses in, and the top-k compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort.  At
    100 TB: cost = the per-series window pass; for long-pattern or
    many-query workloads the production extension is the same row shape
    probed by an LSH/PAA prefilter, with THIS exact form as the re-rank
    (the ann_lsh_bucketed pattern applied to subsequences)."""
    tune(spark)
    from go_pulsar_elasticsearch_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TS_SQL)
