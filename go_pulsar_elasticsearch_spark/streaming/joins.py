"""Stream-stream joins (Structured Streaming's two-unbounded-sides join).

The reference has nothing like this (its only "join" is the O(n*m) ack
matcher, main.go:185-193 — a static membership check).  A real pipeline
correlating two live streams (impressions vs clicks, requests vs
responses) needs an event-time interval join with watermarks bounding
the state the engine must retain on each side.

  interval_join        — the streaming helper: watermark both sides,
                         equi-key + bounded time-range condition.  The
                         range bound is what lets Spark expire state;
                         without it both sides buffer forever.
  stream_interval_join — the registered batch analog (views joined to
                         clicks by the same user within 5 minutes) using
                         the SAME condition builder, hash-certified vs
                         DuckDB.  tests/test_streaming_joins.py then
                         runs the true streaming path across
                         micro-batches and asserts it emits exactly the
                         batch-analog rows.

100 TB posture: a stream-stream join shuffles both sides on the equi
key and keeps only `watermark + upper-bound` minutes of per-key state;
state size is rate x window, independent of stream lifetime.  The batch
analog plans as a SortMergeJoin with the range as residual — one
shuffle per side, same as the streaming exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_RANGE_MIN = 5  # click must land within 5 minutes after the view


def _join_cond(l_user: Column, r_user: Column, l_ts: Column, r_ts: Column) -> Column:
    """Equi-key + bounded event-time range — shared by the batch analog
    and the streaming path so certification transfers."""
    return (
        (l_user == r_user)
        & (r_ts >= l_ts)
        & (r_ts <= l_ts + F.expr(f"INTERVAL {_RANGE_MIN} MINUTES"))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_key: str,
    right_key: str,
    watermark: str = "10 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Watermarked event-time interval join of two streams.  Both sides
    get the same watermark; the range condition comes from _join_cond.
    State retention per side is bounded by watermark + range upper
    bound — the knob that keeps a 100 TB/day stream joinable."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = _join_cond(
        lw[left_key], rw[right_key], lw[left_ts], rw[right_ts]
    )
    return lw.join(rw, cond, join_type)


_INTERVAL_ORACLE = f"""
SELECT
  v.user_id,
  v.event_id AS view_id,
  c.event_id AS click_id,
  v.ts AS view_ts,
  c.ts AS click_ts
FROM events v
JOIN events c
  ON c.user_id = v.user_id
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL {_RANGE_MIN} MINUTE
WHERE v.event_type = 'view' AND c.event_type = 'click'
"""


@register("stream_interval_join", _INTERVAL_ORACLE)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the streaming interval join: every (view, click)
    pair by the same user with the click inside the 5-minute window
    after the view.  Identical condition expression as interval_join;
    the streaming equivalence test drives the true streaming path on
    the same rows."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    cond = _join_cond(
        F.col("v_user"), F.col("c_user"), F.col("view_ts"), F.col("click_ts")
    )
    return v.join(c, cond).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
    )


_INTERVAL_LEFT_ORACLE = f"""
SELECT
  v.user_id,
  v.event_id AS view_id,
  c.event_id AS click_id,
  v.ts AS view_ts,
  c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = v.user_id
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL {_RANGE_MIN} MINUTE
"""


@register("stream_interval_join_left", _INTERVAL_LEFT_ORACLE)
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER batch analog: every view, with its in-window clicks or
    nulls — the attribution shape ("which impressions converted, which
    didn't") that needs outer semantics.  In the true streaming form
    the null row for an unmatched view can only be emitted once the
    watermark passes the view's window (the engine must know no click
    can still arrive) — asserted in tests/test_streaming_joins.py; the
    state bound is identical to the inner form."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    cond = _join_cond(
        F.col("v_user"), F.col("c_user"), F.col("view_ts"), F.col("click_ts")
    )
    return v.join(c, cond, "left").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
    )


_INTERVAL_FULL_ORACLE = f"""
SELECT
  COALESCE(v.user_id, c.user_id) AS user_id,
  v.event_id AS view_id,
  c.event_id AS click_id,
  v.ts AS view_ts,
  c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = v.user_id
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL {_RANGE_MIN} MINUTE
"""


@register("stream_interval_join_full", _INTERVAL_FULL_ORACLE)
def stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER batch analog, completing the interval-join family:
    unmatched views AND orphan clicks both surface with nulls — the
    reconciliation shape ("every impression and every conversion,
    matched where possible").  Structured Streaming supports full outer
    stream-stream joins under the same watermark/time-bound contract as
    the left form (both sides' state evicted once the watermark clears
    the interval); the null rows emit only at watermark passage.  Same
    single user_id exchange pair as the inner/left forms."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    cond = _join_cond(
        F.col("v_user"), F.col("c_user"), F.col("view_ts"), F.col("click_ts")
    )
    return v.join(c, cond, "full").select(
        F.coalesce("v_user", "c_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
    )


# --------------------------------------------------------------------------
# stream-static enrichment (dimension lookup on a live stream)
# --------------------------------------------------------------------------


def static_enrich(stream_df: DataFrame, customer: DataFrame,
                  nation: DataFrame) -> DataFrame:
    """Enrich a (possibly streaming) events frame with the customer ->
    nation dimension chain.  Structured Streaming allows joining an
    unbounded side to static DataFrames directly — the static side is
    re-planned per micro-batch (so slowly-changing dims pick up file
    updates), needs NO watermark, and keeps the whole join stateless.

    100 TB posture: customer is SF-proportional (the largest TPC-H
    dimension — billions of rows at warehouse scale), so no broadcast
    hint: at fixture sizes AQE broadcasts it anyway (the stream never
    shuffles), and past the broadcast ceiling the per-batch join
    degrades gracefully to a shuffle join instead of OOMing the driver
    on the first micro-batch.  nation-sized dims always broadcast."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("_nk"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).join(
        nation.select(
            F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation")
        ),
        "_nk",
    ).drop("_nk")
    return stream_df.join(dim, "user_id")


_STATIC_ENRICH_ORACLE = """
SELECT
  e.event_id,
  e.user_id,
  e.event_type,
  c.c_mktsegment AS mktsegment,
  n.n_name AS nation
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n   ON n.n_nationkey = c.c_nationkey
"""


@register("stream_static_enrich", _STATIC_ENRICH_ORACLE)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the stream-static dimension join: every event
    enriched with its user's market segment and nation.  Identical
    helper as the streaming path; tests/test_streaming_joins.py drives
    the true readStream plan through static_enrich and asserts it emits
    exactly these rows."""
    tune(spark)
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return static_enrich(
        ev, t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    ).select("event_id", "user_id", "event_type", "mktsegment", "nation")
