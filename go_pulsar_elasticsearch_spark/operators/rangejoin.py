"""Range-join bucketization + as-of join (SURVEY.md §2B custom-operator
slot: ops Spark lacks as primitives, built from compositions).

`join_range_bucketed` rewrites a band/range theta-join into an equi-join
on discretized buckets — the 100 TB answer to join_cross_theta's
BroadcastNestedLoopJoin: each probe row lands in the buckets its band
overlaps, the join is hash-partitioned on bucket id, and a residual
filter restores exactness.  The oracle is the PLAIN range join, proving
the rewrite is result-invisible.

`events_asof_join` is the as-of join expressed as a running
conditional-max window — one shuffle on the key, no point-in-time
subquery per row.  Matching rule: the latest view STRICTLY PRECEDING the
purchase in (ts, event_id) order — ts ties are broken by event_id, on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.operators.joins import _THETA_ORACLE
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# join_range_bucketed
# --------------------------------------------------------------------------

# p_size domain is 1..50, bands are 11 wide: width-4 buckets give 13
# probe-side buckets with each band overlapping 3-4 — the key's spread
# scales with domain/bucket_width, so size the width a fraction of the
# band width, never a multiple of it.
_BUCKET = 4

# Oracle: the straightforward range join — bucketization must not change
# the result.  SHARED with join_cross_theta: both operators certify the
# same semantics, one via nested loop, one via the bucket rewrite.
_RANGE_ORACLE = _THETA_ORACLE


@register("join_range_bucketed", _RANGE_ORACLE)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query as join_cross_theta (literally the same oracle SQL),
    executed as an equi-join: parts hash into bucket floor(p_size/4);
    each supplier band explodes into the 3-4 buckets it overlaps; the
    join key is the bucket id and a residual BETWEEN filter keeps exact
    semantics.  The shuffle key's cardinality is domain/bucket_width —
    size the width well below the band width so the join spreads (a
    compound key with a salt handles domains this small at scale)."""
    tune(spark)
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").withColumn(
        "bucket", (F.col("p_size") / _BUCKET).cast("int")
    )
    lo = (F.col("s_suppkey") % 20).cast("int")
    hi = lo + 10
    s_banded = (
        s.withColumn("lo", lo)
        .withColumn("hi", hi)
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col("lo") / _BUCKET).cast("int"),
                    (F.col("hi") / _BUCKET).cast("int"),
                )
            ),
        )
    )
    return (
        s_banded.join(p, "bucket")
        .filter(F.col("p_size").between(F.col("lo"), F.col("hi")))
        .groupBy("s_suppkey")
        .agg(
            F.count("*").alias("n_parts_in_band"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
    )


# --------------------------------------------------------------------------
# events_asof_join
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH marked AS (
  SELECT user_id, event_id, event_type, ts,
    max(CASE WHEN event_type = 'view' THEN ts END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS last_view_ts
  FROM events
)
SELECT
  user_id,
  event_id AS purchase_id,
  CAST(epoch_ms(ts) AS BIGINT) AS purchase_ms,
  CAST(epoch_ms(last_view_ts) AS BIGINT) AS asof_view_ms,
  CAST(epoch_ms(ts) - epoch_ms(last_view_ts) AS BIGINT) AS ms_since_view
FROM marked
WHERE event_type = 'purchase'
"""


@register("events_asof_join", _ASOF_ORACLE)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest view that
    strictly precedes it in (ts, event_id) order (ties on ts break by
    event_id — the same total order the oracle uses).  A per-row
    point-in-time lookup becomes one running conditional-max window —
    single shuffle on user_id, no per-row subquery.  (The two-table form
    merges both sides with a tag column first; here both live in
    events.)  Only the two participating event types enter the window:
    other types can neither match nor anchor, so filtering them first
    shrinks the shuffle+sort by their share of the stream."""
    tune(spark)
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_view_ts", last_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.unix_millis("ts").alias("purchase_ms"),
            F.unix_millis("last_view_ts").alias("asof_view_ms"),
            (F.unix_millis("ts") - F.unix_millis("last_view_ts")).alias(
                "ms_since_view"
            ),
        )
    )


# --------------------------------------------------------------------------
# asof_join_tolerance  (ASOF ... TOLERANCE: staleness-bounded match)
# --------------------------------------------------------------------------

_TOL_MS = 6 * 3600 * 1000  # 6 hours

_ASOF_TOL_ORACLE = f"""
WITH marked AS (
  SELECT user_id, event_id, event_type, ts,
    max(CASE WHEN event_type = 'view' THEN ts END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS last_view_ts
  FROM events
)
SELECT
  user_id,
  event_id AS purchase_id,
  CAST(epoch_ms(ts) AS BIGINT) AS purchase_ms,
  CAST(CASE WHEN epoch_ms(ts) - epoch_ms(last_view_ts) <= {_TOL_MS}
            THEN epoch_ms(last_view_ts) END AS BIGINT) AS asof_view_ms,
  (last_view_ts IS NOT NULL
   AND epoch_ms(ts) - epoch_ms(last_view_ts) <= {_TOL_MS}) AS within_tolerance
FROM marked
WHERE event_type = 'purchase'
"""


@register("asof_join_tolerance", _ASOF_TOL_ORACLE)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN ... TOLERANCE (kdb/QuestDB/pandas merge_asof semantics):
    the latest preceding view matches ONLY if it is at most 6 h stale —
    beyond that the match is NULLed, not silently ancient.  Same single
    running-conditional-max window as events_asof_join; the tolerance is
    a post-predicate, so the plan cost is identical."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    marked = ev.withColumn("last_view_ts", last_view)
    age = F.unix_millis("ts") - F.unix_millis("last_view_ts")
    within = F.col("last_view_ts").isNotNull() & (age <= _TOL_MS)
    return marked.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_millis("ts").alias("purchase_ms"),
        F.when(age <= _TOL_MS, F.unix_millis("last_view_ts")).alias(
            "asof_view_ms"
        ),
        within.alias("within_tolerance"),
    )
