"""ES aggregation parity, part 4: normalize, frequent_item_sets,
bucket_correlation, and scripted_metric.

Four more aggregations from the ES 8.x surface a Kibana user runs
against the index the reference maintains (pkg/es/es.go:102-116's dated
`events-YYYY.MM.DD` layout exists for exactly these dashboards):

  normalize_agg           — the `normalize` pipeline agg: rescale a
                            bucket metric per series (percent_of_sum
                            and rescale_0_1 methods).
  frequent_item_sets_agg  — the `frequent_item_sets` agg: co-occurring
                            item pairs above a support threshold
                            (Eclat-style, transactions = documents,
                            items = distinct tokens).
  bucket_correlation_agg  — the `bucket_correlation` pipeline agg
                            (count_correlation): Pearson r between two
                            per-bucket count series.
  scripted_metric_agg     — the `scripted_metric` agg's map/combine/
                            reduce contract: a custom signed-revenue
                            metric with per-partition partial states
                            merged associatively.

100 TB posture: every op's first stage is one map-side-combined
aggregate whose output is bucket-/vocab-bounded; pipeline math then
runs on bucket rows only.  frequent_item_sets explodes per-doc DISTINCT
token pairs — output is vocab^2-bounded, never all-pairs across docs.
bucket_correlation accumulates integer moment sums (exact at any
scale; the one double expression runs on a 1-row frame).
scripted_metric is the aggregate Spark already executes as
map/combine/reduce: partial_sum per partition, merge at the exchange —
the ES contract is native here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# normalize_agg  (ES normalize pipeline agg: percent_of_sum + rescale_0_1)
# --------------------------------------------------------------------------

_NORMALIZE_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
  CAST(n AS DOUBLE) / SUM(n) OVER ws AS pct_of_sum,
  CASE WHEN MAX(n) OVER ws > MIN(n) OVER ws
       THEN CAST(n - MIN(n) OVER ws AS DOUBLE)
            / (MAX(n) OVER ws - MIN(n) OVER ws)
       ELSE 0.0e0 END AS rescaled_0_1
FROM daily
WINDOW ws AS (PARTITION BY event_type)
"""


@register("normalize_agg", _NORMALIZE_ORACLE)
def normalize_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``normalize`` pipeline agg over a per-event_type daily
    date_histogram, methods percent_of_sum (bucket / series total) and
    rescale_0_1 ((bucket - min) / (max - min), constant series -> 0 —
    guarded identically on both engines so no division by zero ever
    executes).

    Plan: one shuffle for the histogram; all three series statistics
    (sum/min/max) ride ONE unordered window partitioned by series over
    bucket rows — integer sums, two exactly-rounded double divisions."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    ws = Window.partitionBy("event_type")
    mn, mx = F.min("n").over(ws), F.max("n").over(ws)
    return daily.select(
        "event_type",
        "day",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(ws)).alias(
            "pct_of_sum"
        ),
        F.when(
            mx > mn, (F.col("n") - mn).cast("double") / (mx - mn)
        )
        .otherwise(F.lit(0.0))
        .alias("rescaled_0_1"),
    )


# --------------------------------------------------------------------------
# frequent_item_sets_agg  (ES frequent_item_sets: co-occurring pairs)
# --------------------------------------------------------------------------

_FIS_MIN_SUPPORT = 0.15  # fraction of all docs a pair must co-occur in

_FREQUENT_ITEM_SETS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(text, ' '),
                                   x -> x <> '')) AS items
  FROM documents
), pairs AS (
  SELECT doc_id, pair[1] AS item_a, pair[2] AS item_b
  FROM (
    SELECT doc_id,
           unnest(flatten(list_transform(items,
             a -> list_transform(list_filter(items, b -> b > a),
                                 b -> [a, b])))) AS pair
    FROM toks
  )
), counts AS (
  SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS doc_count
  FROM pairs GROUP BY 1, 2
), total AS (
  SELECT COUNT(*) AS n_docs FROM documents
)
SELECT item_a, item_b, doc_count,
       CAST(doc_count AS DOUBLE) / n_docs AS support
FROM counts CROSS JOIN total
WHERE CAST(doc_count AS DOUBLE) / n_docs >= {_FIS_MIN_SUPPORT}e0
"""


@register("frequent_item_sets_agg", _FREQUENT_ITEM_SETS_ORACLE)
def frequent_item_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``frequent_item_sets`` agg (size-2 sets): transactions are
    documents, items are each doc's DISTINCT tokens; report every
    ordered pair (a < b) co-occurring in >= {sup} of all docs with its
    doc_count and support.  The Eclat shape ES itself uses: candidate
    pairs are generated WITHIN each transaction (distinct-token arrays
    are vocabulary-bounded), never by joining transactions against
    each other.

    Plan: one tokenize+distinct pass, explode the per-doc pair list
    (|vocab|^2-bounded per doc), one map-side-combined count keyed by
    pair, and a 1-row total broadcast for the support division —
    support filtering happens AFTER the count so the shuffle carries
    pair partials, not raw pairs."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("items"),
    )
    # explode distinct items, then one single-level lambda builds each
    # item's greater partners from the SAME row-local array (nested
    # HOFs are interpreted CodegenFallback — the span_near lesson)
    pairs = (
        toks.select("doc_id", F.explode("items").alias("item_a"), "items")
        .select(
            "doc_id",
            "item_a",
            F.expr("filter(items, b -> b > item_a)").alias("bs"),
        )
        .select("doc_id", "item_a", F.explode("bs").alias("item_b"))
    )
    counts = pairs.groupBy("item_a", "item_b").agg(
        F.count("*").alias("doc_count")
    )
    total = docs.agg(F.count("*").alias("n_docs"))
    support = F.col("doc_count").cast("double") / F.col("n_docs")
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(support >= _FIS_MIN_SUPPORT)
        .select("item_a", "item_b", "doc_count", support.alias("support"))
    )


# --------------------------------------------------------------------------
# bucket_correlation_agg  (ES bucket_correlation: count_correlation)
# --------------------------------------------------------------------------

_BUCKET_CORRELATION_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_error
  FROM events GROUP BY 1
), moments AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS nb,
         CAST(SUM(CAST(n_total AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(n_error AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(n_total AS DECIMAL(19,0))
                  * CAST(n_total AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(n_error AS DECIMAL(19,0))
                  * CAST(n_error AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS syy,
         CAST(SUM(CAST(n_total AS DECIMAL(19,0))
                  * CAST(n_error AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxy
  FROM daily
)
SELECT CAST(nb AS BIGINT) AS n_buckets,
  CASE WHEN nb * sxx - sx * sx > 0 AND nb * syy - sy * sy > 0 THEN
    CAST(nb * sxy - sx * sy AS DOUBLE)
      / sqrt(CAST(nb * sxx - sx * sx AS DOUBLE)
             * CAST(nb * syy - sy * sy AS DOUBLE))
  ELSE CAST(NULL AS DOUBLE) END AS correlation
FROM moments
"""


@register("bucket_correlation_agg", _BUCKET_CORRELATION_ORACLE)
def bucket_correlation_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bucket_correlation`` pipeline agg (count_correlation
    function): Pearson r between the daily total-event and error-event
    count series.  Moments are accumulated as exact DECIMAL(38,0)
    integer sums over bucket rows (order-independent; per-row squares
    cast to DECIMAL(19,0) first so a 3e9-count day cannot overflow the
    int64 product, and the 38-digit cross products are exact to ~1e25
    — far past the 100 TB operating point), so the only floating-point
    arithmetic is the final 1-row expression: two subtractions, one
    multiply, one sqrt, one divide — all IEEE-correctly-rounded, hence
    bit-identical cross-engine (the house rule that keeps corr()
    certifiable where the engines' own `corr` accumulation orders
    would drift).  A zero-variance series (constant counts, or a
    single bucket) yields NULL on BOTH engines — guarded identically,
    so no division by zero ever executes under ANSI mode.

    Plan: one histogram shuffle, one 1-row moment aggregate."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_error"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = daily.agg(
        F.count("*").cast("decimal(38,0)").alias("nb"),
        F.sum(F.col("n_total").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sx"),
        F.sum(F.col("n_error").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sy"),
        F.sum(d19("n_total") * d19("n_total"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(d19("n_error") * d19("n_error"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(d19("n_total") * d19("n_error"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    nb, sx, sy = F.col("nb"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    vx, vy = nb * sxx - sx * sx, nb * syy - sy * sy
    r = F.when(
        (vx > 0) & (vy > 0),
        (nb * sxy - sx * sy).cast("double")
        / F.sqrt(vx.cast("double") * vy.cast("double")),
    ).otherwise(F.lit(None).cast("double"))
    return m.select(
        nb.cast("bigint").alias("n_buckets"), r.alias("correlation")
    )


# --------------------------------------------------------------------------
# scripted_metric_agg  (ES scripted_metric: map/combine/reduce contract)
# --------------------------------------------------------------------------

# The canonical ES example: a signed-revenue metric where the map script
# emits +value for one class of docs and -value for the rest, each shard
# combines its partials, and reduce merges shard states.  Spark executes
# exactly this contract natively: partial_sum per partition (map +
# combine), merge at the exchange (reduce).
_SM_POSITIVE = ("click", "view")  # map: +value for these, -value else
_SM_COHORTS = 10

_SCRIPTED_METRIC_ORACLE = f"""
SELECT CAST(user_id % {_SM_COHORTS} AS BIGINT) AS cohort,
  {SUMD("CASE WHEN event_type IN ({})"
        " THEN value ELSE -value END".format(
            ", ".join(f"'{p}'" for p in _SM_POSITIVE)), 2, 18)}
    AS signed_value,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM events
GROUP BY 1
"""


@register("scripted_metric_agg", _SCRIPTED_METRIC_ORACLE)
def scripted_metric_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``scripted_metric`` agg, per user cohort: the map script
    emits +value for {pos} events and -value otherwise, combine sums
    per shard, reduce merges shards — state is a (signed sum, doc
    count) pair.  Spark's hash aggregate IS this contract
    (partial_sum = map+combine per partition, final merge = reduce),
    so the op compiles to one map-side-combined aggregate; the signed
    double sum rides the exact-decimal accumulator (order-independent,
    certifiable at any parallelism).

    Plan: one shuffle keyed by cohort, cohort-count-bounded output."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    signed = F.when(
        F.col("event_type").isin(list(_SM_POSITIVE)), F.col("value")
    ).otherwise(-F.col("value"))
    return (
        ev.groupBy(
            (F.col("user_id") % _SM_COHORTS).cast("bigint").alias("cohort")
        )
        .agg(
            dsum(signed, 2, 18).alias("signed_value"),
            F.count("*").alias("n_docs"),
        )
    )
