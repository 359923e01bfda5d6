"""ES pipeline-aggregation parity, part 2: moving_fn / serial_diff,
bucket_script / bucket_selector / bucket_sort, and auto_date_histogram.

`pipeline_agg_derivative` (events_analytics.py) covers the derivative +
cumulative_sum pair; these three close the rest of the pipeline-agg
surface ES dashboards run against the index the reference maintains
(pkg/es/es.go:102-116 — the dated `events-YYYY.MM.DD` layout exists for
exactly these date_histogram dashboards):

  pipeline_agg_moving_fn     — `moving_fn` (unweightedAvg, window=3,
                               shift=0: the 3 buckets BEFORE current)
                               + `serial_diff` (lag=7, the weekly
                               seasonality remover) over a per-series
                               date_histogram.
  pipeline_agg_bucket_script — `bucket_script` (per-bucket error rate
                               from two sibling metrics), `bucket_selector`
                               (keep buckets above the rate threshold)
                               and `bucket_sort` (rate DESC, size cap).
  auto_date_histogram        — ES's span-adaptive histogram: the engine
                               picks the smallest interval from the
                               rounding ladder that keeps the bucket
                               count under the target, from the data's
                               own [min, max] span.

100 TB posture: every op is one map-side-combined histogram aggregate
whose output is bucket-count-sized; the pipeline columns ride window
sorts partitioned by series (bucket rows, never raw rows), the selector
/ sort run on the bucket frame, and auto_date_histogram's span probe is
a 1-row min/max aggregate broadcast back into the bucketing expression
— the raw scan is always exactly one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# pipeline_agg_moving_fn  (ES moving_fn + serial_diff over date_histogram)
# --------------------------------------------------------------------------

# ES moving_fn semantics: window=N, shift=0 places the frame over the N
# buckets strictly BEFORE the current one (the current bucket is never
# part of its own smoothing window), and a frame with no buckets yields
# null.  serial_diff(lag=7) is the weekly-seasonality remover: value
# minus the bucket 7 positions earlier, null while no such bucket.
_MF_WINDOW = 3
_MF_LAG = 7

_MOVING_FN_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
  CAST(SUM(n) OVER w{_MF_WINDOW} AS DOUBLE) / COUNT(n) OVER w{_MF_WINDOW}
    AS mavg{_MF_WINDOW},
  CAST(n - lag(n, {_MF_LAG}) OVER wo AS BIGINT) AS sdiff{_MF_LAG}
FROM daily
WINDOW wo AS (PARTITION BY event_type ORDER BY day),
       w{_MF_WINDOW} AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN {_MF_WINDOW} PRECEDING AND 1 PRECEDING)
"""


@register("pipeline_agg_moving_fn", _MOVING_FN_ORACLE)
def pipeline_agg_moving_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``moving_fn`` (unweightedAvg, window=3, shift=0) and
    ``serial_diff`` (lag=7) pipeline aggs over a per-event_type daily
    date_histogram.  The moving frame covers the 3 buckets BEFORE the
    current one (ES shift=0), so the first bucket of every series gets
    null — same on both engines (empty-frame SUM is null).

    Plan: one shuffle for the histogram; both pipeline columns ride a
    single (event_type, day) window sort over bucket rows.  The average
    is written CAST(SUM AS DOUBLE)/COUNT so the integer sum stays exact
    and the one double division is correctly rounded on both engines."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wf = wo.rowsBetween(-_MF_WINDOW, -1)
    return daily.select(
        "event_type",
        "day",
        "n",
        (F.sum("n").over(wf).cast("double") / F.count("n").over(wf)).alias(
            f"mavg{_MF_WINDOW}"
        ),
        (F.col("n") - F.lag("n", _MF_LAG).over(wo)).alias(f"sdiff{_MF_LAG}"),
    )


# --------------------------------------------------------------------------
# pipeline_agg_bucket_script  (bucket_script + bucket_selector + bucket_sort)
# --------------------------------------------------------------------------

# bucket_script: err_rate = n_error / n_total from two sibling metrics;
# bucket_selector: keep buckets with err_rate > threshold (5 uniform
# event types -> the expected rate is 0.2, so the threshold keeps the
# above-average days at every sf); bucket_sort: rate DESC, size cap.
_BS_THRESHOLD = 0.2
_BS_SIZE = 10

_BUCKET_SCRIPT_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_error
  FROM events GROUP BY 1
)
SELECT day, n_total, n_error,
       CAST(n_error AS DOUBLE) / n_total AS err_rate
FROM daily
WHERE CAST(n_error AS DOUBLE) / n_total > {_BS_THRESHOLD}
ORDER BY err_rate DESC, day
LIMIT {_BS_SIZE}
"""


@register("pipeline_agg_bucket_script", _BUCKET_SCRIPT_ORACLE)
def pipeline_agg_bucket_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bucket_script`` + ``bucket_selector`` + ``bucket_sort`` over a
    daily date_histogram: per-bucket error rate from two sibling metrics
    (one conditional aggregate — no second scan), selector keeps buckets
    above the 0.2 expected rate, bucket_sort caps to the 10 worst days.

    Plan: ONE map-side-combined aggregate to bucket rows, then the
    script/selector/sort all run on the bucket-count-sized frame; the
    cap is orderBy().limit() = TakeOrderedAndProject.  The rate is a
    single division of two exact integers — bit-identical everywhere.
    The (err_rate DESC, day) order is total, so the selected set is
    deterministic."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_error"),
    )
    rate = F.col("n_error").cast("double") / F.col("n_total")
    return (
        daily.select("day", "n_total", "n_error", rate.alias("err_rate"))
        .filter(F.col("err_rate") > _BS_THRESHOLD)
        .orderBy(F.desc("err_rate"), "day")
        .limit(_BS_SIZE)
    )


# --------------------------------------------------------------------------
# auto_date_histogram  (span-adaptive interval from the rounding ladder)
# --------------------------------------------------------------------------

# ES auto_date_histogram: the caller names a target bucket count; the
# engine walks its rounding ladder (1m, 5m, 30m, 1h, 3h, 12h, 1d, 7d)
# and picks the smallest interval that keeps the realized bucket count
# at or under the target.  Buckets are epoch-floored at the chosen
# width; the chosen width is reported alongside the buckets.
_ADH_TARGET = 20
_ADH_LADDER = (60, 300, 1800, 3600, 10800, 43200, 86400, 604800)


def _adh_case_sql() -> str:
    """The ladder walk as one CASE over the 1-row span frame: bucket
    count at width w is (smax // w - smin // w + 1) — exact under the
    epoch-floor bucketing used below."""
    arms = " ".join(
        f"WHEN smax // {w} - smin // {w} + 1 <= {_ADH_TARGET} THEN {w}"
        for w in _ADH_LADDER[:-1]
    )
    return f"CASE {arms} ELSE {_ADH_LADDER[-1]} END"


_AUTO_DATE_HISTOGRAM_ORACLE = f"""
WITH span AS (
  SELECT CAST(floor(epoch(MIN(ts))) AS BIGINT) AS smin,
         CAST(floor(epoch(MAX(ts))) AS BIGINT) AS smax
  FROM events
), params AS (
  SELECT CAST({_adh_case_sql()} AS BIGINT) AS interval_s FROM span
)
SELECT interval_s,
       CAST((CAST(floor(epoch(ts)) AS BIGINT) // interval_s) * interval_s
            AS BIGINT) AS bucket_s,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events CROSS JOIN params
GROUP BY 1, 2
"""


@register("auto_date_histogram", _AUTO_DATE_HISTOGRAM_ORACLE)
def auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``auto_date_histogram`` (target 20 buckets): probe the data's
    [min, max] epoch span with a 1-row aggregate, walk the rounding
    ladder to the smallest interval whose realized bucket count fits the
    target, then histogram on that width.  Buckets are epoch-floored
    longs (`bucket_s`) with the chosen `interval_s` carried alongside —
    integer arithmetic end to end, so the adaptive choice itself is
    hash-certified.

    Plan: the span probe is a 1-row min/max aggregate broadcast back
    into the bucketing expression (a literal-sized cross join, exactly
    the matrix_stats moments pattern); the histogram is ONE map-side-
    combined aggregate.  Two passes over the scan total — the same two
    passes ES spends (its first pass is the shard-level round-down)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    span = ev.agg(
        F.min(sec).alias("smin"), F.max(sec).alias("smax")
    )
    interval = None
    for w in _ADH_LADDER[:-1]:
        fits = (
            F.expr(f"smax div {w}") - F.expr(f"smin div {w}") + 1
        ) <= _ADH_TARGET
        interval = (
            F.when(fits, F.lit(w)) if interval is None
            else interval.when(fits, F.lit(w))
        )
    params = span.select(
        interval.otherwise(F.lit(_ADH_LADDER[-1]))
        .cast("bigint")
        .alias("interval_s")
    )
    return (
        ev.crossJoin(F.broadcast(params))
        .groupBy(
            "interval_s",
            (
                F.call_function("div", sec, F.col("interval_s"))
                * F.col("interval_s")
            )
            .cast("bigint")
            .alias("bucket_s"),
        )
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# percentiles_bucket  (exact percentiles over sibling-aggregation buckets)
# --------------------------------------------------------------------------

# ES `percentiles_bucket` is the sibling pipeline agg that summarizes a
# histogram's bucket VALUES (not raw docs): "what does a p95 day look
# like".  ES computes it exactly over the materialized bucket list (no
# TDigest — the bucket frame is small by construction).  Cross-engine
# determinism: nearest-rank percentiles (value at 1-indexed rank
# ceil(p*n/100) of the sorted bucket values) — the selected value is an
# ACTUAL bucket value, so the output stays exact integers; the ceil is
# integer arithmetic ((p*n + 99) div 100), no float anywhere.
_PB_PERCENTS = (25, 50, 75, 95, 99)

_PERCENTILES_BUCKET_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, day) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM daily
), pcts AS (
  SELECT unnest(ARRAY{list(_PB_PERCENTS)}) AS percent
)
SELECT event_type, CAST(percent AS INTEGER) AS percent,
       CAST(cnt AS BIGINT) AS n_buckets,
       CAST(n AS BIGINT) AS value
FROM ranked JOIN pcts ON rk = (percent * cnt + 99) // 100
"""


@register("percentiles_bucket", _PERCENTILES_BUCKET_ORACLE)
def percentiles_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``percentiles_bucket`` over a per-event_type daily
    date_histogram: exact nearest-rank percentiles (25/50/75/95/99) of
    the daily bucket counts, one row per (event_type, percent), with
    the bucket census (`n_buckets`) alongside.

    Plan: ONE map-side-combined aggregate to bucket rows, one
    (event_type) window sort over the bucket-count-sized frame for
    rank + census, then a row-local explode of the 5 percents and a
    rank-match filter — no second shuffle, no join.  The percentile
    value is an actual bucket value selected by integer rank, so the
    whole op is exact integer arithmetic (hash-certified, unlike
    interpolated percentiles which would need the float-trap
    treatment)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    wp = Window.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "n",
        F.row_number().over(wp.orderBy("n", "day")).alias("rk"),
        F.count("*").over(wp).alias("cnt"),
    )
    return (
        ranked.select(
            "event_type",
            "n",
            "rk",
            "cnt",
            F.explode(
                F.array(*[F.lit(p) for p in _PB_PERCENTS])
            ).alias("percent"),
        )
        .filter(
            F.col("rk")
            == F.expr("(percent * cnt + 99) div 100")
        )
        .select(
            "event_type",
            F.col("percent").cast("int").alias("percent"),
            F.col("cnt").cast("long").alias("n_buckets"),
            F.col("n").cast("long").alias("value"),
        )
    )


# --------------------------------------------------------------------------
# extended_stats_bucket  (sibling stats over a histogram's bucket values)
# --------------------------------------------------------------------------

# ES `stats_bucket` returns count/min/max/avg/sum over the sibling
# buckets; `extended_stats_bucket` adds sum_of_squares, variance
# (population, per ES docs), and std_deviation.  One op emits the full
# extended surface (the plain stats columns are a prefix of it).
# Cross-engine exactness: the bucket values are exact BIGINT counts, so
# sum and sum_of_squares are exact integers; avg/variance/std are the
# SAME IEEE expression tree on both engines (divide-then-subtract, with
# sqrt correctly rounded), so the doubles hash bit-equal — same recipe
# as t_test_welch.

_EXT_STATS_BUCKET_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS bucket_count,
       CAST(MIN(n) AS BIGINT) AS min_n,
       CAST(MAX(n) AS BIGINT) AS max_n,
       CAST(SUM(n) AS BIGINT) AS sum_n,
       CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_n,
       CAST(SUM(n * n) AS BIGINT) AS sum_of_squares,
       CAST(SUM(n * n) AS DOUBLE) / COUNT(*)
         - (CAST(SUM(n) AS DOUBLE) / COUNT(*))
           * (CAST(SUM(n) AS DOUBLE) / COUNT(*)) AS variance,
       sqrt(CAST(SUM(n * n) AS DOUBLE) / COUNT(*)
            - (CAST(SUM(n) AS DOUBLE) / COUNT(*))
              * (CAST(SUM(n) AS DOUBLE) / COUNT(*))) AS std_deviation
FROM daily GROUP BY event_type
"""


@register("extended_stats_bucket", _EXT_STATS_BUCKET_ORACLE)
def extended_stats_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``stats_bucket`` + ``extended_stats_bucket`` over the
    per-event_type daily date_histogram: count/min/max/sum/avg of the
    bucket values plus sum_of_squares, population variance, and
    std_deviation — the sibling-agg summary Kibana's "stats over time
    buckets" panel issues.

    Plan: ONE map-side-combined aggregate to bucket rows, then a second
    bucket-count-sized aggregate per series; integer sums stay exact
    (daily counts are small enough that sum of squares is far below
    2^63), and every double column is one shared IEEE expression."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    cnt = F.count("*")
    s = F.sum("n")
    ss = F.sum(F.col("n") * F.col("n"))
    avg = s.cast("double") / cnt
    var = ss.cast("double") / cnt - avg * avg
    return daily.groupBy("event_type").agg(
        cnt.cast("long").alias("bucket_count"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
        s.cast("long").alias("sum_n"),
        avg.alias("avg_n"),
        ss.cast("long").alias("sum_of_squares"),
        var.alias("variance"),
        F.sqrt(var).alias("std_deviation"),
    )


# --------------------------------------------------------------------------
# moving_percentiles_agg  (ES moving_percentiles pipeline agg — exact
# over the trailing 5-bucket window)
# --------------------------------------------------------------------------

from go_pulsar_elasticsearch_spark.functions.exact import dsum as _dsum
from go_pulsar_elasticsearch_spark.functions.exact import SUMD as _SUMD

_MP_WINDOW = 5  # trailing buckets per percentile window

_MOVING_PCTL_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, {_SUMD('value', 2)} AS x
  FROM events GROUP BY 1
), win AS (
  SELECT day, x,
         row_number() OVER (ORDER BY day) AS rk,
         quantile_cont(x, 0.25) OVER w AS mp25,
         quantile_cont(x, 0.5)  OVER w AS mp50,
         quantile_cont(x, 0.75) OVER w AS mp75
  FROM daily
  WINDOW w AS (ORDER BY day
               ROWS BETWEEN {_MP_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT day, x, mp25, mp50, mp75
FROM win WHERE rk >= {_MP_WINDOW}
"""


@register("moving_percentiles_agg", _MOVING_PCTL_ORACLE)
def moving_percentiles_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``moving_percentiles`` pipeline agg: the trailing-5-bucket
    p25/p50/p75 of the daily value series (exact here; ES moves a
    TDigest).  Only FULL windows are emitted, which is also what makes
    the op hash-certifiable: with exactly 5 values, the interpolation
    positions (n-1)*p land on integers (1, 2, 3), so both engines pick
    exact elements of the sorted window and no interpolation
    arithmetic ever runs.

    Scale shape: one daily histogram aggregate, then a window over
    day-count bucket rows (never raw rows)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        _dsum("value", 2).alias("x")
    )
    w = Window.orderBy("day").rowsBetween(1 - _MP_WINDOW, Window.currentRow)
    rk = F.row_number().over(Window.orderBy("day"))
    return (
        daily.select(
            "day",
            "x",
            rk.alias("rk"),
            F.percentile("x", 0.25).over(w).alias("mp25"),
            F.percentile("x", 0.5).over(w).alias("mp50"),
            F.percentile("x", 0.75).over(w).alias("mp75"),
        )
        .filter(F.col("rk") >= _MP_WINDOW)
        .drop("rk")
    )
