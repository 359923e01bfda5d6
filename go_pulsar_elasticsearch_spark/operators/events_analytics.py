"""Event-stream analytics over the `events` table: conversion funnel and
retention cohorts — the queries an ES/Kibana user of the reference would
run against the indexed stream, expressed (and certified) in the engine
itself.

Both are single-shuffle-per-stage shapes: funnel = per-user min-time per
step then step-order conditions; retention = cohort (first-day) join
back to activity days.  At 100 TB the user_id partitioning spreads both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# events_funnel  (view -> click -> purchase, ordered per user)
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
), staged AS (
  SELECT user_id,
    CAST(t_view IS NOT NULL AS INTEGER) AS s1,
    CAST(t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view
         AS INTEGER) AS s2,
    CAST(t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view
         AND t_purchase IS NOT NULL AND t_purchase > t_click
         AS INTEGER) AS s3
  FROM per_user
)
SELECT
  CAST(SUM(s1) AS BIGINT) AS n_viewed,
  CAST(SUM(s2) AS BIGINT) AS n_clicked_after_view,
  CAST(SUM(s3) AS BIGINT) AS n_purchased_after_click,
  CAST(SUM(s3) AS DOUBLE) / SUM(s1) AS conversion
FROM staged
"""


@register("events_funnel", _FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel: first view -> later first click -> later
    first purchase, counted per user (conditional-min aggregation, one
    shuffle on user_id)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_click")
    )
    staged = per_user.select(
        s1.cast("int").alias("s1"),
        s2.cast("int").alias("s2"),
        s3.cast("int").alias("s3"),
    )
    return staged.agg(
        F.sum("s1").alias("n_viewed"),
        F.sum("s2").alias("n_clicked_after_view"),
        F.sum("s3").alias("n_purchased_after_click"),
        (F.sum("s3").cast("double") / F.sum("s1")).alias("conversion"),
    )


# --------------------------------------------------------------------------
# events_retention  (daily cohorts x day offset)
# --------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT
  CAST(CAST(f.cohort_day AS TIMESTAMP) AS TIMESTAMP) AS cohort_day,
  CAST(date_diff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM firsts f JOIN activity a ON a.user_id = f.user_id
WHERE date_diff('day', f.cohort_day, a.active_day) <= 7
GROUP BY 1, 2
"""


@register("events_retention", _RETENTION_ORACLE)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on each
    of their first 7 active day-offsets."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts")).select(
        "user_id", F.to_date("first_ts").alias("cohort_day")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("active_day")).distinct()
    joined = firsts.join(activity, "user_id")
    day_offset = F.datediff("active_day", "cohort_day")
    return (
        joined.select(
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            day_offset.alias("day_offset"),
            "user_id",
        )
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# --------------------------------------------------------------------------
# fuzzy_match_levenshtein  (blocked edit-distance matching)
# --------------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH heads AS (
  SELECT doc_id, source, substr(text, 1, 24) AS head FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS INTEGER) AS edit_dist
FROM heads a JOIN heads b
  ON a.source = b.source AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 8
"""


@register("fuzzy_match_levenshtein", _FUZZY_ORACLE)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: edit distance over 24-char heads within source
    blocks (blocking bounds the pair count; levenshtein's integer DP is
    identical across engines)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    heads = docs.select("doc_id", "source", F.substring("text", 1, 24).alias("head"))
    a, b = heads.alias("a"), heads.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 8)
    )


# --------------------------------------------------------------------------
# events_sessionize
# --------------------------------------------------------------------------

_SESSIONIZE_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 6 HOUR
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n,
       (prev_ts IS NULL OR ts > prev_ts + INTERVAL 6 HOUR) AS new_session
FROM (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
"""


@register("events_sessionize", _SESSIONIZE_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization that ASSIGNS a session id to every event
    (the batch complement of session_window aggregation, which only
    yields per-session rows): a session breaks after a >6 h gap, and the
    running sum of break flags numbers sessions per user.

    lag() and the running sum share one partitionBy(user)/orderBy(ts)
    spec, so Catalyst plans a single Window node — ONE shuffle on the
    user key regardless of corpus size.  Ties broken by event_id for
    determinism at any scale."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = prev_ts.isNull() | (
        F.col("ts") > prev_ts + F.expr("INTERVAL 6 HOURS")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(is_new.cast("int")).over(run).cast("bigint").alias("session_n"),
        is_new.alias("new_session"),
    )


# --------------------------------------------------------------------------
# ohlc_downsample
# --------------------------------------------------------------------------

_OHLC_ORACLE = f"""
WITH x AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         value,
         FIRST_VALUE(value) OVER w AS open_v,
         LAST_VALUE(value)  OVER w AS close_v
  FROM events
  WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket,
       MIN(open_v)  AS open,
       MAX(value)   AS high,
       MIN(value)   AS low,
       MIN(close_v) AS close,
       {{SUMD}}     AS volume,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM x GROUP BY event_type, bucket
"""


@register(
    "ohlc_downsample",
    _OHLC_ORACLE.format(SUMD="CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"),
)
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to daily OHLC bars per event type (the
    hypertable-rollup / candlestick query).  open/close come from
    deterministic full-frame first/last over (ts, event_id) order —
    portable where arg_min/arg_max tie-breaking is not — and the
    follow-up groupBy reuses the window's hash partitioning, so the
    whole rollup is ONE shuffle.  Volume uses the exact-decimal sum so
    the double hash-matches DuckDB regardless of add order."""
    from go_pulsar_elasticsearch_spark.functions.exact import dsum

    tune(spark)
    ev = t(spark, sf_dir, "events").withColumn(
        "bucket", F.date_trunc("day", F.col("ts"))
    )
    w = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    framed = ev.select(
        "event_type",
        "bucket",
        "value",
        F.first("value").over(w).alias("open_v"),
        F.last("value").over(w).alias("close_v"),
    )
    return framed.groupBy("event_type", "bucket").agg(
        F.min("open_v").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min("close_v").alias("close"),
        dsum("value").alias("volume"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# histogram_equi_width
# --------------------------------------------------------------------------

_N_BINS = 20

_HIST_ORACLE = f"""
WITH mm AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events),
binned AS (
  SELECT LEAST(CAST(FLOOR((value - vmin) / ((vmax - vmin) / {_N_BINS})) AS BIGINT),
               {_N_BINS - 1}) AS bin,
         vmin, vmax
  FROM events, mm
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       round(vmin + bin * ((vmax - vmin) / {_N_BINS}), 6) AS bin_lo,
       round(vmin + (bin + 1) * ((vmax - vmin) / {_N_BINS}), 6) AS bin_hi
FROM binned GROUP BY bin, vmin, vmax
"""


@register("histogram_equi_width", _HIST_ORACLE)
def histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of events.value in 20 bins: global min/max
    via one scalar aggregate broadcast back over the scan (two passes,
    no wide shuffle — the second pass's groupBy carries 20 keys), the
    top value clamped into the last bin.  Bin arithmetic is identical
    IEEE double ops in both engines; only the rounded bin edges are
    emitted.  The classic distribution profile before outlier filtering
    at corpus scale."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    mm = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    width = (F.col("vmax") - F.col("vmin")) / _N_BINS
    binned = ev.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor((F.col("value") - F.col("vmin")) / width).cast("bigint"),
            F.lit(_N_BINS - 1),
        ).alias("bin"),
        "vmin",
        "vmax",
    )
    return binned.groupBy("bin", "vmin", "vmax").agg(
        F.count("*").alias("cnt"),
    ).select(
        "bin",
        "cnt",
        F.round(F.col("vmin") + F.col("bin") * width, 6).alias("bin_lo"),
        F.round(F.col("vmin") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
    )


# --------------------------------------------------------------------------
# ewma_smooth
# --------------------------------------------------------------------------

_EWMA_K = 8  # truncated horizon; alpha = 0.5 so weight_j = 2^-j exactly

_EWMA_LAGS_SQL = ",\n         ".join(
    f"LAG(value, {j}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l{j}"
    for j in range(_EWMA_K)
)
_EWMA_NUM_SQL = " + ".join(
    f"COALESCE(l{j} * {1.0 / (1 << j)!r}, 0.0)" for j in range(_EWMA_K)
)
_EWMA_DEN_SQL = " + ".join(
    f"(CASE WHEN l{j} IS NOT NULL THEN {1.0 / (1 << j)!r} ELSE 0.0 END)"
    for j in range(_EWMA_K)
)

_EWMA_ORACLE = f"""
SELECT event_id, user_id, ts, value,
       ({_EWMA_NUM_SQL}) / ({_EWMA_DEN_SQL}) AS ewma
FROM (
  SELECT event_id, user_id, ts, value,
         {_EWMA_LAGS_SQL}
  FROM events
)
"""


@register("ewma_smooth", _EWMA_ORACLE)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of events.value per user,
    truncated to the last 8 observations with alpha = 0.5.  The infinite
    recursion y_t = a*x_t + (1-a)*y_{t-1} is not expressible as a window
    aggregate; the 8-term truncation (weights within 2^-8 of exact) is —
    and because every weight 2^-j and each value*2^-j product is exact
    in IEEE doubles, with both engines evaluating the identical
    left-associated addition chain, the result hash-matches with no
    decimal machinery at all.

    All 8 lags share one partitionBy(user)/orderBy(ts, event_id) window
    spec -> a single Window node, ONE shuffle on user_id at any scale."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        *[F.lag("value", j).over(w).alias(f"l{j}") for j in range(_EWMA_K)],
    )
    num = None
    den = None
    for j in range(_EWMA_K):
        wt = 1.0 / (1 << j)
        nterm = F.coalesce(F.col(f"l{j}") * F.lit(wt), F.lit(0.0))
        dterm = F.when(F.col(f"l{j}").isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = nterm if num is None else num + nterm
        den = dterm if den is None else den + dterm
    return lagged.select(
        "event_id", "user_id", "ts", "value", (num / den).alias("ewma")
    )


# --------------------------------------------------------------------------
# transition_matrix
# --------------------------------------------------------------------------

_TRANSITION_ORACLE = """
SELECT prev_type, event_type,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY prev_type) AS prob
FROM (
  SELECT prev_type, event_type, COUNT(*) AS cnt
  FROM (
    SELECT event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
"""


@register("transition_matrix", _TRANSITION_ORACLE)
def transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) with raw pair counts — the behavioral
    fingerprint behind next-event prediction and bot detection.

    Shape: the lag window shuffles once on user_id; the pair groupBy
    collapses the corpus to |types|^2 rows with map-side combine, and the
    normalizing window runs on that tiny matrix.  The probability is a
    single exact integer division, so no decimal machinery is needed."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    total = F.sum("cnt").over(Window.partitionBy("prev_type"))
    return pairs.select(
        "prev_type",
        "event_type",
        "cnt",
        (F.col("cnt").cast("double") / total).alias("prob"),
    )


# --------------------------------------------------------------------------
# anomaly_zscore
# --------------------------------------------------------------------------

_Z_THRESHOLD = 3.0

_ZSCORE_ORACLE = f"""
WITH stats AS (
  SELECT user_id,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(18,4))) AS DOUBLE) AS s2
  FROM events GROUP BY user_id
), z AS (
  SELECT e.event_id, e.user_id, e.value,
         (e.value - s1 / n)
           / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS zscore
  FROM events e JOIN stats s ON s.user_id = e.user_id
  WHERE n >= 2 AND (s2 - s1 * s1 / n) / (n - 1) > 0
)
SELECT event_id, user_id, value, zscore
FROM z WHERE abs(zscore) > {_Z_THRESHOLD}
"""


@register("anomaly_zscore", _ZSCORE_ORACLE)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier flags (|z| > 3): the streaming-telemetry
    anomaly pass.  Mean and variance come from exact decimal first/second
    moments (sum, sum-of-squares) so both engines start from identical
    doubles; everything after is the same +,-,*,/,sqrt expression tree,
    hence bit-identical — stddev_samp() itself is NOT portable (merge
    order differs), which is why the moments are explicit.

    Shape: one groupBy shuffle for the per-user moment table, then a join
    back to the events (same user_id key — co-partitioned at scale, AQE
    broadcasts the small side here)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    from go_pulsar_elasticsearch_spark.functions.exact import dsum

    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        dsum("value", scale=2).alias("s1"),
        dsum(F.col("value") * F.col("value"), scale=4, out_scale=4).alias("s2"),
    )
    var_s = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("value") - F.col("s1") / F.col("n")) / F.sqrt(var_s)
    return (
        ev.join(stats, "user_id")
        .filter((F.col("n") >= 2) & (var_s > 0))
        .select("event_id", "user_id", "value", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > _Z_THRESHOLD)
    )


# --------------------------------------------------------------------------
# funnel_time_constrained  (signup -> purchase within a conversion window)
# --------------------------------------------------------------------------

_WINDOW_SQL = "INTERVAL 3 DAY"

_TC_FUNNEL_ORACLE = f"""
WITH s AS (
  SELECT user_id, min(ts) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
)
SELECT s.user_id, s.t_signup,
       min(p.ts) AS t_purchase,
       (min(p.ts) IS NOT NULL) AS converted
FROM s LEFT JOIN events p
  ON p.user_id = s.user_id
 AND p.event_type = 'purchase'
 AND p.ts > s.t_signup
 AND p.ts <= s.t_signup + {_WINDOW_SQL}
GROUP BY s.user_id, s.t_signup
"""


@register("funnel_time_constrained", _TC_FUNNEL_ORACLE)
def funnel_time_constrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed conversion funnel: first signup, then earliest purchase
    within 3 days of it (the attribution-window form real funnels use;
    events_funnel's ordered variant has no deadline).

    Shape: per-user conditional min (one shuffle), then a left join back
    to purchases on user_id with the time bounds as join predicates —
    both sides partition on user_id, so at scale this is a co-partitioned
    join, and the final regroup rides the same partitioning."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = s.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") > F.col("t_signup"))
        & (F.col("p_ts") <= F.col("t_signup") + F.expr(_WINDOW_SQL)),
        "left",
    )
    return joined.groupBy("user_id", "t_signup").agg(
        F.min("p_ts").alias("t_purchase"),
        F.min("p_ts").isNotNull().alias("converted"),
    )


# --------------------------------------------------------------------------
# pipeline_agg_derivative  (ES pipeline aggs: derivative + cumulative_sum
# over date_histogram buckets, per event_type series)
# --------------------------------------------------------------------------

_DERIV_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
  CAST(n AS BIGINT) AS n,
  CAST(n - lag(n) OVER w AS BIGINT) AS delta_n,
  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS cum_n
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
"""


@register("pipeline_agg_derivative", _DERIV_ORACLE)
def pipeline_agg_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggregations over a date_histogram: per event_type
    daily counts with `derivative` (day-over-day delta) and
    `cumulative_sum` buckets.  One shuffle for the histogram; both
    pipeline columns ride a single (event_type, day) window sort whose
    partition count is the series count — bucket rows, not raw rows."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "event_type",
        "day",
        "n",
        (F.col("n") - F.lag("n").over(w)).alias("delta_n"),
        F.sum("n").over(wcum).alias("cum_n"),
    )


# --------------------------------------------------------------------------
# anomaly_mad  (robust outliers: median absolute deviation, exact medians)
# --------------------------------------------------------------------------

_MAD_K = 5.0  # |x - median| > K * MAD flags the outlier

_MAD_ORACLE = f"""
WITH arrs AS (
  SELECT event_id, user_id, value,
    list_sort(list(value) OVER (PARTITION BY user_id)) AS arr
  FROM events
), med AS (
  SELECT event_id, user_id, value,
    arr[(len(arr) + 1) // 2] AS med
  FROM arrs
), devs AS (
  SELECT event_id, user_id, value, med,
    list_sort(list(abs(value - med)) OVER (PARTITION BY user_id)) AS darr
  FROM med
), mad AS (
  SELECT event_id, user_id, value, med,
    darr[(len(darr) + 1) // 2] AS mad
  FROM devs
)
SELECT event_id, user_id, value, med, mad
FROM mad
WHERE mad > 0 AND abs(value - med) > {_MAD_K} * mad
"""


@register("anomaly_mad", _MAD_ORACLE)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outliers: |x - median| > 5 * MAD — immune to the
    outliers polluting the baseline the way mean/stddev are
    (anomaly_zscore's failure mode).  Medians are EXACT order statistics
    (lower-median rule spelled out as sorted-array indexing so both
    engines agree on even counts; DuckDB's median() interpolates, hence
    the oracle uses the same element-exact definition below via
    percentile_disc-compatible indexing).  One user_id window shuffle
    shared by both median passes."""
    tune(spark)
    ev = t(spark, sf_dir, "events")

    # Per-user medians via GROUPED aggregation + join-back, NOT a
    # whole-partition collect_list window: the window form materializes
    # the sorted array once PER ROW (O(n^2) memory/compute per user
    # history); the grouped form builds it once per user and joins the
    # scalar back (co-partitioned on user_id, broadcast at this scale).
    def _median_of(df, val_col: str, out: str):
        arr = F.array_sort(F.collect_list(val_col))
        return df.groupBy("user_id").agg(
            F.element_at(
                arr, ((F.size(arr) + 1) / 2).cast("int")
            ).alias(out)
        )

    meds = _median_of(ev, "value", "med")
    step1 = ev.join(meds, "user_id").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mads = _median_of(step1, "dev", "mad")
    return (
        step1.join(mads, "user_id")
        .filter((F.col("mad") > 0) & (F.col("dev") > _MAD_K * F.col("mad")))
        .select("event_id", "user_id", "value", "med", "mad")
    )


# --------------------------------------------------------------------------
# quality_drift_monitor  (daily data-quality stats + day-over-day drift)
# --------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(value) AS BIGINT) AS n_null_value,
         {AVGD2} AS mean_value,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM events GROUP BY 1
)
SELECT day, n_rows, n_null_value, mean_value, n_types,
  CAST(n_rows - lag(n_rows) OVER w AS BIGINT) AS d_rows,
  mean_value - lag(mean_value) OVER w AS d_mean
FROM daily
WINDOW w AS (ORDER BY day)
"""


@register(
    "quality_drift_monitor",
    _DRIFT_ORACLE.replace("{AVGD2}", "(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) / COUNT(value))"),
)
def quality_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality monitoring over the ingest stream: per-day volume,
    null rate, exact mean, and type cardinality, each with its
    day-over-day delta — the drift table a pipeline alerts on (the
    reference only counts errors, metrics.go:9-41; this is the
    content-level complement).  One histogram shuffle; the deltas ride
    one bucket-level window (30 rows) — a global sort of BUCKETS, never
    of raw rows."""
    from go_pulsar_elasticsearch_spark.functions.exact import dsum

    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("value")).alias("n_null_value"),
        (dsum("value", scale=2) / F.count("value")).alias("mean_value"),
        F.countDistinct("event_type").alias("n_types"),
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "n_rows",
        "n_null_value",
        "mean_value",
        "n_types",
        (F.col("n_rows") - F.lag("n_rows").over(w)).alias("d_rows"),
        (F.col("mean_value") - F.lag("mean_value").over(w)).alias("d_mean"),
    )


# --------------------------------------------------------------------------
# pattern_detect_sequence  (MATCH_RECOGNIZE-lite: consecutive A->B->C)
# --------------------------------------------------------------------------

_PATTERN = "view>click>purchase"

_PATTERN_ORACLE = f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(strpos(seq, '{_PATTERN}') AS INTEGER) AS match_pos,
       CAST(len(string_split(seq, '>')) AS BIGINT) AS n_events
FROM seqs
WHERE strpos(seq, '{_PATTERN}') > 0
"""


@register("pattern_detect_sequence", _PATTERN_ORACLE)
def pattern_detect_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching (MATCH_RECOGNIZE-lite): users whose event
    stream contains the CONSECUTIVE sequence view->click->purchase —
    stricter than the funnel ops, which allow gaps.  The per-user
    ordered sequence is built with one sort-based aggregation (the
    event-type alphabet contains no '>' so the join is unambiguous);
    substring search does the pattern match.  One shuffle on user_id;
    the pattern state never exceeds the per-user event string."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id, event_type))),"
                " x -> x.event_type)"
            ),
        ).alias("seq")
    )
    pos = F.instr("seq", _PATTERN)
    return (
        seqs.select(
            "user_id",
            pos.cast("int").alias("match_pos"),
            F.size(F.split("seq", ">")).cast("long").alias("n_events"),
        )
        .filter(F.col("match_pos") > 0)
    )


# --------------------------------------------------------------------------
# sessionize_capped  (gap-based sessions with a max-duration cap)
# --------------------------------------------------------------------------

_CAP_GAP = "INTERVAL 6 HOUR"
_CAP_MS = 24 * 3600 * 1000  # sessions also split every 24 h of duration

_CAPPED_ORACLE = f"""
WITH lagged AS (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), gap_sessions AS (
  SELECT event_id, user_id, ts,
    SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + {_CAP_GAP}
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS gap_n
  FROM lagged
), anchored AS (
  SELECT event_id, user_id, ts, gap_n,
    min(ts) OVER (PARTITION BY user_id, gap_n) AS session_start
  FROM gap_sessions
)
SELECT event_id, user_id, ts,
  CAST(gap_n AS BIGINT) AS gap_session,
  CAST((epoch_ms(ts) - epoch_ms(session_start)) // {_CAP_MS} AS BIGINT)
    AS cap_slice,
  CAST(gap_n * 1000
       + (epoch_ms(ts) - epoch_ms(session_start)) // {_CAP_MS} AS BIGINT)
    AS session_id
FROM anchored
"""


@register("sessionize_capped", _CAPPED_ORACLE)
def sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH break rules real trackers use: a >6 h
    inactivity gap starts a new session, and a session is additionally
    sliced every 24 h of elapsed duration (no infinite sessions from
    drip activity).  The cap slices at fixed offsets from the gap
    session's start — one extra (user, gap_n) window over the
    gap-session pass; both windows share the user_id shuffle."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(wo)
    new_s = (
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr(_CAP_GAP))
    ).cast("int")
    gaps = ev.select(
        "event_id", "user_id", "ts",
        F.sum(new_s).over(run).alias("gap_n"),
    )
    start = F.min("ts").over(Window.partitionBy("user_id", "gap_n"))
    slice_n = F.call_function(
        "div",
        F.unix_millis("ts") - F.unix_millis(start),
        F.lit(_CAP_MS),
    )
    return gaps.select(
        "event_id", "user_id", "ts",
        F.col("gap_n").cast("long").alias("gap_session"),
        slice_n.cast("long").alias("cap_slice"),
        (F.col("gap_n") * 1000 + slice_n).cast("long").alias("session_id"),
    )


# --------------------------------------------------------------------------
# late_data_profile  (out-of-orderness distribution -> watermark choice)
# --------------------------------------------------------------------------

_LATE_ORACLE = """
WITH arrival AS (
  SELECT event_id, ts,
    max(ts) OVER (ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
  FROM events
), lateness AS (
  SELECT epoch_ms(hwm) - epoch_ms(ts) AS late_ms FROM arrival
)
SELECT
  CASE
    WHEN late_ms = 0 THEN 'on-time'
    WHEN late_ms <= 60000 THEN '<=1min'
    WHEN late_ms <= 600000 THEN '<=10min'
    WHEN late_ms <= 3600000 THEN '<=1h'
    WHEN late_ms <= 86400000 THEN '<=1d'
    ELSE '>1d'
  END AS lateness_bucket,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(MAX(late_ms) AS BIGINT) AS max_late_ms
FROM lateness
GROUP BY 1
"""


@register("late_data_profile", _LATE_ORACLE)
def late_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark design data: how out-of-order is the stream?  Lateness
    of each event = high-water mark of event time (in arrival order =
    event_id) minus its own event time, bucketed.  The bucket counts ARE
    the watermark decision: `withWatermark` should cover the bucket that
    holds your completeness target (e.g. p99).

    The arrival-order high-water mark is the two-pass prefix MAX
    (functions/prefix.py) — range-partitioned on arrival order, local
    running maxes, prior-partition maxes broadcast back — so even this
    diagnostic runs without a global sort."""
    from go_pulsar_elasticsearch_spark.functions.prefix import global_running_max

    tune(spark)
    ev = t(spark, sf_dir, "events")
    hw = global_running_max(
        ev.select("event_id", "ts"), [F.col("event_id")], "ts", "hwm",
        "late_prefix",
    )
    late_ms = F.unix_millis("hwm") - F.unix_millis("ts")
    bucket = (
        F.when(late_ms == 0, "on-time")
        .when(late_ms <= 60000, "<=1min")
        .when(late_ms <= 600000, "<=10min")
        .when(late_ms <= 3600000, "<=1h")
        .when(late_ms <= 86400000, "<=1d")
        .otherwise(">1d")
    )
    return (
        hw.select(bucket.alias("lateness_bucket"), late_ms.alias("late_ms"))
        .groupBy("lateness_bucket")
        .agg(
            F.count("*").alias("n"),
            F.max("late_ms").alias("max_late_ms"),
        )
    )


# --------------------------------------------------------------------------
# activity_heatmap  (day-of-week x hour grid — the dashboard heatmap feed)
# --------------------------------------------------------------------------

_HEATMAP_ORACLE = """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""


@register("activity_heatmap", _HEATMAP_ORACLE)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar heatmap feed: events bucketed on the (day-of-week, hour)
    grid with volume and unique-user counts — at most 168 output rows
    from any input size, one map-combined shuffle.  Spark's dayofweek
    (1=Sunday) matches DuckDB's dayofweek+1, spelled below."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# event_trigram_paths  (top event-type 3-step paths)
# --------------------------------------------------------------------------

# transition_matrix models single steps; product analytics wants the
# dominant multi-step PATHS ("view -> click -> purchase").  Per-user
# ordered trigrams via two lags on one window shuffle, then a global
# count — output bounded by |event_types|^3.
_TRIGRAM_TOPK = 15

_TRIGRAM_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type, 2) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t0,
         LAG(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t1
  FROM events
)
SELECT t0 || '>' || t1 || '>' || event_type AS path,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE t0 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT {_TRIGRAM_TOPK}
"""


@register("event_trigram_paths", _TRIGRAM_ORACLE)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 15 three-step event paths corpus-wide: two lags on the
    per-user time order (one window shuffle), a |types|^3-bounded
    count, and a TakeOrderedAndProject top-k.  The n-step
    generalization of transition_matrix."""
    tune(spark)
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("t0"),
        F.lag("event_type", 1).over(w).alias("t1"),
    ).filter(F.col("t0").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "t0", "t1", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(_TRIGRAM_TOPK)
    )
