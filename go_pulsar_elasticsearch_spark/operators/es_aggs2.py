"""ES aggregation parity, part 3: top_metrics, boxplot, rate,
variable_width_histogram, cumulative_cardinality, change_point,
categorize_text.

Seven aggregations from the ES 8.x surface a Kibana user runs against
the index the reference maintains (pkg/es/es.go:102-116's dated
`events-YYYY.MM.DD` layout is built for exactly these dashboard aggs):

  top_metrics_agg         — ES `top_metrics`: per bucket, the metric
                            columns of the single row with the maximal
                            sort key (fully tie-broken, so the answer
                            is a function of the data, not the plan).
  boxplot_agg             — ES `boxplot`: min / q1 / q2 / q3 / max /
                            IQR per bucket (exact quantiles here; ES
                            uses TDigest — the exact form is the
                            certifiable baseline, cf. agg_percentiles).
  rate_agg                — ES `rate` (unit=hour) inside a daily
                            date_histogram: bucket sum and count
                            normalized to per-hour rates.
  variable_width_histogram_agg — ES `variable_width_histogram`
                            approximated by its deterministic
                            equal-frequency analog: bucket boundaries
                            are exact corpus quantiles (broadcast, one
                            probe pass), assignment is a per-row
                            comparison chain.
  cumulative_cardinality_agg — ES `cumulative_cardinality` pipeline
                            agg: distinct users per day plus the
                            running total of FIRST-SEEN users (the
                            exact semantics ES documents: the
                            cumulative count of new uniques).
  change_point_agg        — ES `change_point` (the AIOps step
                            detector), deterministic variant: CUSUM
                            argmax over the daily value series with
                            before/after means.
  categorize_text_agg     — ES `categorize_text`: log-template
                            categorization.  Deterministic variant:
                            digit runs normalize to '#' and the
                            template is the message's token prefix —
                            10k distinct messages collapse to the
                            handful of true templates.

Cross-engine exactness: every sum is an exact decimal (functions.exact),
quantiles interpolate on integral values (exact in both engines) or are
rounded to 6 decimals before any comparison, the CUSUM accumulates
DECIMAL terms (associative — DuckDB's segment-tree window order cannot
diverge from Spark's running order), and tie-breaks are total orders.

100 TB posture: each op is one map-side-combined aggregate whose output
is bucket-count-sized; variable_width's boundary probe and change_point's
mean are 1-row aggregates broadcast back into the scan; the pipeline
windows (cumulative, CUSUM) sort bucket rows, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# top_metrics_agg  (ES top_metrics: metrics of the max-sort-key row)
# --------------------------------------------------------------------------

_TOP_METRICS_ORACLE = """
SELECT l_returnflag, l_shipdate AS top_shipdate,
       l_extendedprice AS top_price, l_orderkey AS top_orderkey
FROM (
  SELECT l_returnflag, l_shipdate, l_extendedprice, l_orderkey,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_shipdate DESC, l_extendedprice DESC, l_orderkey DESC
         ) AS rk
  FROM lineitem
) WHERE rk = 1
"""


@register("top_metrics_agg", _TOP_METRICS_ORACLE)
def top_metrics_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``top_metrics`` per return flag: the price/orderkey of the
    LATEST-shipped line item (sort: shipdate DESC), tie-broken by
    price then orderkey so the winner is unique.

    Plan shape: ``max(struct(sort_key, tiebreaks, metrics))`` — struct
    comparison is lexicographic, so one map-side-combined MAX replaces
    the window-sort-over-everything form the oracle spells out (ES
    keeps exactly one candidate per bucket per shard and merges — this
    is that plan).  No row ever shuffles; the aggregate state is one
    struct per bucket."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    top = F.max(
        F.struct("l_shipdate", "l_extendedprice", "l_orderkey")
    ).alias("m")
    return (
        li.groupBy("l_returnflag")
        .agg(top)
        .select(
            "l_returnflag",
            F.col("m.l_shipdate").alias("top_shipdate"),
            F.col("m.l_extendedprice").alias("top_price"),
            F.col("m.l_orderkey").alias("top_orderkey"),
        )
    )


# --------------------------------------------------------------------------
# boxplot_agg  (ES boxplot: min/q1/q2/q3/max/IQR, exact quantiles)
# --------------------------------------------------------------------------

_BOXPLOT_ORACLE = """
SELECT l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(l_quantity) AS q_min,
       quantile_cont(l_quantity, 0.25) AS q1,
       quantile_cont(l_quantity, 0.5) AS q2,
       quantile_cont(l_quantity, 0.75) AS q3,
       MAX(l_quantity) AS q_max,
       quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25)
         AS iqr
FROM lineitem
GROUP BY l_linestatus
"""


@register("boxplot_agg", _BOXPLOT_ORACLE)
def boxplot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``boxplot`` per line status over quantity: the five-number
    summary plus IQR.  l_quantity is integral, so quartile
    interpolation at k/4 positions is exact in both engines (the
    agg_percentiles precedent); the subtraction is then exact too.
    At corpus scale the TDigest form (agg_approx) replaces this exact
    baseline — same query shape, sketchy state."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    q1 = F.percentile(q, 0.25)
    q3 = F.percentile(q, 0.75)
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.min(q).alias("q_min"),
        q1.alias("q1"),
        F.percentile(q, 0.5).alias("q2"),
        q3.alias("q3"),
        F.max(q).alias("q_max"),
        (q3 - q1).alias("iqr"),
    )


# --------------------------------------------------------------------------
# rate_agg  (ES rate, unit=hour, inside a daily date_histogram)
# --------------------------------------------------------------------------

_RATE_ORACLE = f"""
SELECT date_trunc('day', ts) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {SUMD('value', 2)} AS sum_value,
       {SUMD('value', 2)} / 24 AS value_per_hour,
       CAST(COUNT(*) AS DOUBLE) / 24 AS events_per_hour
FROM events
WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("rate_agg", _RATE_ORACLE)
def rate_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rate`` (unit=hour) inside a daily ``date_histogram`` over
    purchase events: per-day sum and count normalized to per-hour
    rates — the agg ES dashboards chart as "revenue per hour, by day".
    One map-side-combined aggregate; the closing divisions run on the
    exact decimal sum and the bigint count, so both engines' doubles
    agree bit-for-bit."""
    tune(spark)
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    sum_v = dsum("value", 2)
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        sum_v.alias("sum_value"),
        (sum_v / 24).alias("value_per_hour"),
        (F.count("*").cast("double") / 24).alias("events_per_hour"),
    )


# --------------------------------------------------------------------------
# variable_width_histogram_agg  (deterministic equal-frequency analog)
# --------------------------------------------------------------------------

_VWH_BUCKETS = 6
# quantile fractions embedded as exact double reprs so both engines
# evaluate the interpolation at the identical position
_VWH_FRACS = [i / _VWH_BUCKETS for i in range(1, _VWH_BUCKETS)]

_VWH_ORACLE = f"""
WITH b AS (
  SELECT {", ".join(
      f"round(quantile_cont(value, {f!r}), 6) AS b{i}"
      for i, f in enumerate(_VWH_FRACS, start=1)
  )}
  FROM events
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS v_min, MAX(value) AS v_max,
       {SUMD('value', 2)} / COUNT(*) AS v_mean
FROM (
  SELECT value,
         {" + ".join(
             f"(CASE WHEN value > b{i} THEN 1 ELSE 0 END)"
             for i in range(1, _VWH_BUCKETS)
         )} AS bucket
  FROM events CROSS JOIN b
)
GROUP BY bucket
"""


@register("variable_width_histogram_agg", _VWH_ORACLE)
def variable_width_histogram_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES ``variable_width_histogram`` (deterministic analog): ES
    clusters values into data-adaptive buckets with an order-dependent
    heuristic; the certifiable equivalent is equal-frequency bucketing
    on exact corpus quantiles — the same "buckets follow the data's
    density" behavior, as a pure function of the data.

    Scale shape: the boundary probe is ONE 1-row aggregate (exact
    sort-based quantiles here; percentile_approx at 100 TB — same
    plan), broadcast back into the scan; assignment is a per-row
    comparison chain and the per-bucket stats partial-aggregate
    map-side.  Boundaries are rounded to 6 decimals on BOTH engines
    before any comparison, so a last-ulp interpolation difference
    cannot flip a bucket assignment (values are 2-decimal)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        *[
            F.round(F.percentile("value", f), 6).alias(f"b{i}")
            for i, f in enumerate(_VWH_FRACS, start=1)
        ]
    )
    bucket = F.lit(0)
    for i in range(1, _VWH_BUCKETS):
        bucket = bucket + F.when(
            F.col("value") > F.col(f"b{i}"), 1
        ).otherwise(0)
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(F.col("value"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            (dsum("value", 2) / F.count("*")).alias("v_mean"),
        )
    )


# --------------------------------------------------------------------------
# cumulative_cardinality_agg  (running total of first-seen uniques)
# --------------------------------------------------------------------------

_CUMCARD_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS daily_users
  FROM events GROUP BY 1
), first_seen AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS day FROM events GROUP BY 1
), new_users AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY 1
)
SELECT d.day, d.daily_users,
       CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (
         ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cumulative_users
FROM daily d LEFT JOIN new_users n ON n.day = d.day
"""


@register("cumulative_cardinality_agg", _CUMCARD_ORACLE)
def cumulative_cardinality_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline agg: per day, the distinct
    active users AND the running count of users never seen before —
    exactly ES's documented semantics (the cumulative cardinality is
    the count of accumulated uniques, not a sum of daily cardinalities).

    Scale shape: the first-seen frame is one (user, min(day)) aggregate
    — the classic incremental-uniques plan that replaces re-unioning
    N days of HLLs; dailies are a second map-side-combined aggregate
    over the same scan, and the cumulative window sorts day-count rows
    only.  All counters are exact bigints."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    daily = ev.groupBy(day).agg(
        F.countDistinct("user_id").alias("daily_users")
    )
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("day")
    )
    new_users = first_seen.groupBy("day").agg(
        F.count("*").alias("new_users")
    )
    joined = daily.join(new_users, "day", "left").select(
        "day",
        "daily_users",
        F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.withColumn(
        "cumulative_users", F.sum("new_users").over(w).cast("bigint")
    )


# --------------------------------------------------------------------------
# change_point_agg  (deterministic CUSUM step detector)
# --------------------------------------------------------------------------

_CHANGE_POINT_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, {SUMD('value', 2)} AS x
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mu
  FROM daily
), cs AS (
  SELECT day, x,
         SUM(CAST(round(x - mu, 4) AS DECIMAL(18,4))) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cusum
  FROM daily CROSS JOIN m
), pick AS (
  SELECT day AS change_day, CAST(cusum AS DOUBLE) AS cusum
  FROM cs ORDER BY abs(cusum) DESC, day LIMIT 1
)
SELECT p.change_day, p.cusum,
       CAST(SUM(CASE WHEN d.day <= p.change_day
                     THEN CAST(d.x AS DECIMAL(18,2)) END) AS DOUBLE)
         / SUM(CASE WHEN d.day <= p.change_day THEN 1 ELSE 0 END)
         AS mean_before,
       CAST(SUM(CASE WHEN d.day > p.change_day
                     THEN CAST(d.x AS DECIMAL(18,2)) END) AS DOUBLE)
         / SUM(CASE WHEN d.day > p.change_day THEN 1 ELSE 0 END)
         AS mean_after
FROM daily d CROSS JOIN pick p
GROUP BY p.change_day, p.cusum
"""


@register("change_point_agg", _CHANGE_POINT_ORACLE)
def change_point_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``change_point`` (AIOps step detection), deterministic
    variant: the CUSUM statistic over the daily value series — the day
    where the cumulative deviation from the global mean peaks is the
    level-shift point, reported with the before/after means.

    Cross-engine exactness: daily sums and the split means are exact
    decimals; the CUSUM accumulates round(x - mu, 4) DECIMAL terms, so
    the window sum is associative and DuckDB's segment-tree evaluation
    order cannot diverge from Spark's running-frame order (a raw
    double cusum would differ in the last ulp).

    Scale shape: one daily histogram aggregate (bucket-sized output),
    a 1-row mean broadcast back, and a window over day-count rows.
    The argmax is an orderBy().limit(1) TakeOrderedAndProject."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        dsum("value", 2).alias("x")
    )
    m = daily.agg(
        (dsum("x", 2) / F.count("*")).alias("mu")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cs = (
        daily.crossJoin(F.broadcast(m))
        .withColumn(
            "cusum",
            F.sum(
                F.round(F.col("x") - F.col("mu"), 4).cast("decimal(18,4)")
            ).over(w),
        )
    )
    pick = (
        cs.select(
            F.col("day").alias("change_day"),
            F.col("cusum").cast("double").alias("cusum"),
        )
        .orderBy(F.abs(F.col("cusum")).desc(), F.asc("change_day"))
        .limit(1)
    )
    before = F.col("day") <= F.col("change_day")
    xd = F.col("x").cast("decimal(18,2)")
    return (
        daily.crossJoin(F.broadcast(pick))
        .groupBy("change_day", "cusum")
        .agg(
            (
                F.sum(F.when(before, xd)).cast("double")
                / F.sum(F.when(before, 1).otherwise(0))
            ).alias("mean_before"),
            (
                F.sum(F.when(~before, xd)).cast("double")
                / F.sum(F.when(~before, 1).otherwise(0))
            ).alias("mean_after"),
        )
        .select("change_day", "cusum", "mean_before", "mean_after")
    )


# --------------------------------------------------------------------------
# categorize_text_agg  (log-template categorization)
# --------------------------------------------------------------------------

_CATEGORIZE_ORACLE = """
SELECT regexp_replace(
         event_type || ' user=' || CAST(user_id AS VARCHAR) || ' ' || props,
         '[0-9]+', '#', 'g') AS category,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(MIN(event_id) AS BIGINT) AS example_event_id
FROM events
GROUP BY 1
"""


@register("categorize_text_agg", _CATEGORIZE_ORACLE)
def categorize_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``categorize_text``: semi-structured log messages collapse to
    their templates.  Deterministic variant of ES's token-tree
    categorizer: every digit run normalizes to '#', and the normalized
    message IS the category — the events stream's composed log line
    (`type user=N {"k": N}`) collapses from ~10k distinct messages to
    the handful of true templates.

    Scale shape: one narrow regexp projection + one map-side-combined
    count per template — template cardinality is tiny by construction
    (that is the point of the agg), so the shuffle moves template-count
    rows.  The digit-run regex is the cross-engine-safe subset (no
    perl classes; DuckDB RE2 and Java regex agree on '[0-9]+')."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    msg = F.concat_ws(
        " ",
        F.col("event_type"),
        F.concat(F.lit("user="), F.col("user_id").cast("string")),
        F.col("props"),
    )
    return (
        ev.select(
            F.regexp_replace(msg, "[0-9]+", "#").alias("category"),
            "event_id",
        )
        .groupBy("category")
        .agg(
            F.count("*").alias("doc_count"),
            F.min("event_id").cast("bigint").alias("example_event_id"),
        )
    )
