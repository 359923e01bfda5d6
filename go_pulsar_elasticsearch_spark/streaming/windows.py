"""Event-time windowed aggregation (SURVEY.md §2B streaming block).

`window()` / `session_window()` are the same expression in batch and
streaming; certifying them here in batch mode against DuckDB proves the
*semantics*, and streaming/stream.py reuses the identical transforms with
watermarks (late-data handling certified in tests/test_streaming.py —
watermark behavior is not SQL-expressible).

Scale: a windowed group-by shuffles on (key, window) — at 100 TB the
window width vs key cardinality sets state size; session windows need the
key partitioning anyway, so state stays bounded per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# tumbling
# --------------------------------------------------------------------------

_TUMBLING_ORACLE = f"""
SELECT
  time_bucket(INTERVAL '15 minutes', ts) AS window_start,
  time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  {SUMD('value')} AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@register("stream_tumbling_window_agg", _TUMBLING_ORACLE)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-min tumbling windows per event_type — the batch-certified core of
    the streaming tumbling aggregate (Spark window() ≡ DuckDB time_bucket,
    both epoch-aligned)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "15 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# sliding
# --------------------------------------------------------------------------

# Spark assigns each row to every window [s, s+30min) with s a multiple of
# the 15-min slide and s <= ts < s+30min — exactly two windows per row:
# bucket(ts) and bucket(ts)-15min.  The oracle materializes both
# assignments via UNION ALL, then aggregates.
_SLIDING_ORACLE = f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes', value FROM events
)
SELECT
  window_start,
  window_start + INTERVAL '30 minutes' AS window_end,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  {SUMD('value')} AS total_value
FROM assigned
GROUP BY 1, 2
"""


@register("stream_sliding_window_agg", _SLIDING_ORACLE)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min windows sliding every 15 min (overlap factor 2)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "30 minutes", "15 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# session
# --------------------------------------------------------------------------

# Gaps-and-islands oracle: a session breaks when the gap to the previous
# event exceeds 10 minutes; Spark's session end = last event + gap.
_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT
    user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM flagged
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL '10 minutes' AS session_end,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  {SUMD('value')} AS total_value
FROM numbered
GROUP BY user_id, session_id
"""


@register("stream_session_window", _SESSION_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap
    (session_window works identically in batch and streaming)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    win = F.session_window("ts", "10 minutes")
    return (
        ev.groupBy("user_id", win.alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# trending top-k  (windowed counts -> per-window rank)
# --------------------------------------------------------------------------

_TREND_K = 3

_TRENDING_ORACLE = f"""
WITH counted AS (
  SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
         event_type,
         COUNT(*) AS cnt
  FROM events
  GROUP BY 1, 2
)
SELECT window_start,
       window_start + INTERVAL '6 hours' AS window_end,
       event_type,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY cnt DESC, event_type) AS rk
  FROM counted
)
WHERE rk <= {_TREND_K}
"""


@register("trending_topk", _TRENDING_ORACLE)
def trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Trending now": top-3 event types per 6-hour tumbling window —
    the windowed-count + per-window rank composition behind every
    dashboard leaderboard.  In streaming form the same expression runs
    under a watermark with the rank applied in foreachBatch (rank over
    an unbounded stream isn't incremental); the batch analog here is
    the certified core.

    Shape: one shuffle for the (window, type) count (map-side combined
    — the shuffle carries one row per window x type, not the corpus),
    then a window over the tiny counted table."""
    from pyspark.sql import Window

    tune(spark)
    ev = t(spark, sf_dir, "events")
    counted = (
        ev.groupBy(
            F.window("ts", "6 hours").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(F.desc("cnt"), "event_type")
    )
    return (
        counted.withColumn("rk", rk)
        .filter(F.col("rk") <= _TREND_K)
        .select("window_start", "window_end", "event_type", "cnt", "rk")
    )
