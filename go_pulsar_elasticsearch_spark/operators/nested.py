"""Nested array<struct> operators — ES `nested` query/facet parity.

The reference's only nested type is `tags`: an Avro union
``["null", array<record{type,value}>]`` (index_topic.avro:26-50, Go
binding model.go:40) indexed into ES as a ``nested`` mapping
(mapping.json:41-56).  ES "nested" semantics = per-element matching: a
query like ``nested: {path: tags, query: {term: {tags.type: ...} AND
term: {tags.value: ...}}}`` must match BOTH conditions on the SAME
array element, not across elements.  In Spark that is exactly
higher-order ``exists()/filter()`` over an ``ArrayType(StructType)``
column — evaluated per-row inside codegen, no explode, no shuffle.

The fixture tables carry no array<struct> column, so each operator
first BUILDS the reference-shaped tags array deterministically from
`events` (type='evt' carries event_type; type='k' carries the JSON
props key, zero-padded so string comparison orders numerically) — the
construction is part of the certified surface (both engines build the
same array).

100 TB posture: tag construction and per-element predicates are narrow
projections fused into the scan stage (zero shuffles for the exists
query); the facet costs one shuffle on (tag_type, tag_value) with
map-side partial counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# Shared construction: the reference-shaped tags array.
_TAGS_SPARK = (
    "array("
    " named_struct('type', 'evt', 'value', event_type),"
    " named_struct('type', 'k', 'value',"
    "              lpad(get_json_object(props, '$.k'), 3, '0')))"
)

_TAGS_SQL = (
    "[struct_pack(type := 'evt', value := event_type),"
    " struct_pack(type := 'k',"
    "             value := lpad(json_extract_string(props, '$.k'), 3, '0'))]"
)

# --------------------------------------------------------------------------
# nested_tags_exists  (ES nested bool query: two per-element term matches)
# --------------------------------------------------------------------------

_EXISTS_ORACLE = f"""
WITH tagged AS (
  SELECT event_id, {_TAGS_SQL} AS tags FROM events
)
SELECT event_id,
       list_filter(tags, x -> x.type = 'k')[1].value AS k_value
FROM tagged
WHERE len(list_filter(tags, x -> x.type = 'evt' AND x.value = 'purchase')) > 0
  AND len(list_filter(tags, x -> x.type = 'k' AND x.value >= '080')) > 0
"""


@register("nested_tags_exists", _EXISTS_ORACLE)
def nested_tags_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested query: events whose tags contain BOTH (type='evt',
    value='purchase') and (type='k', value>='080') as single-element
    matches, returning the matched k tag's value.  exists()/filter()
    higher-order functions — per-row, codegen'd, zero shuffles."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    tagged = ev.select("event_id", F.expr(_TAGS_SPARK).alias("tags"))
    return (
        tagged.filter(
            F.expr("exists(tags, x -> x.type = 'evt' AND x.value = 'purchase')")
            & F.expr("exists(tags, x -> x.type = 'k' AND x.value >= '080')")
        )
        .select(
            "event_id",
            F.expr("filter(tags, x -> x.type = 'k')[0].value").alias("k_value"),
        )
    )


# --------------------------------------------------------------------------
# nested_tags_facet  (ES nested terms aggregation over tags)
# --------------------------------------------------------------------------

_FACET_ORACLE = f"""
WITH tagged AS (
  SELECT event_id, {_TAGS_SQL} AS tags FROM events
), flat AS (
  SELECT unnest(tags) AS tg FROM tagged
)
SELECT tg.type AS tag_type, tg.value AS tag_value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM flat
GROUP BY 1, 2
HAVING COUNT(*) >= 5
"""


@register("nested_tags_facet", _FACET_ORACLE)
def nested_tags_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested terms agg: explode tags, count per (type, value), keep
    terms with support >= 5.  One shuffle, map-side combined."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    tagged = ev.select(F.expr(_TAGS_SPARK).alias("tags"))
    return (
        tagged.select(F.explode("tags").alias("tg"))
        .groupBy(
            F.col("tg.type").alias("tag_type"),
            F.col("tg.value").alias("tag_value"),
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


# --------------------------------------------------------------------------
# nested_vs_object_query  (the nested/object mapping distinction itself)
# --------------------------------------------------------------------------

# ES gives array-of-object fields two mappings with famously different
# semantics: `object` (default) FLATTENS the structs into parallel
# arrays (tags.type: [...], tags.value: [...]), so a bool query on
# type AND value can match ACROSS elements — tag A supplies the type,
# tag B the value; `nested` keeps each element its own hidden doc, so
# the conjunction must hit ONE element.  This op certifies BOTH
# verdicts side by side on a tags fixture engineered so they genuinely
# diverge: a second tag type ('q') REUSES the first's ('p') value
# space, so 'p'-typed tags and 'pN' values can come from different
# elements.  Rows with nested_match = false are exactly the object-
# mapping false positives users get bitten by (and the reason
# mapping.json declares tags `nested`).
_VS_TAGS_SPARK = (
    "filter(array("
    " named_struct('type', 'u', 'value', concat('u', cast(user_id as string))),"
    " named_struct('type', 't', 'value', event_type),"
    " if(event_id % 3 != 0,"
    "    named_struct('type', 'p', 'value',"
    "                 concat('p', cast(event_id % 5 as string))),"
    "    cast(null as struct<type:string,value:string>)),"
    " if(event_id % 4 != 0,"
    "    named_struct('type', 'q', 'value',"
    "                 concat('p', cast(event_id % 7 as string))),"
    "    cast(null as struct<type:string,value:string>))"
    "), x -> x is not null)"
)

_VS_ORACLE = """
WITH flags AS (
  SELECT event_id,
         (event_id % 3 <> 0) AS has_p,
         (event_id % 3 <> 0 AND event_id % 5 = 3) AS p_is_p3,
         (event_id % 4 <> 0 AND event_id % 7 = 3) AS q_is_p3
  FROM events
)
SELECT event_id,
       p_is_p3 AS nested_match,
       (has_p AND (p_is_p3 OR q_is_p3)) AS object_match
FROM flags
WHERE has_p AND (p_is_p3 OR q_is_p3)
"""


@register("nested_vs_object_query", _VS_ORACLE)
def nested_vs_object_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For the condition (tag.type = 'p' AND tag.value = 'p3'): every
    event the OBJECT mapping would match (independent exists() per
    field), flagged with whether the NESTED mapping (one exists() over
    the conjunction) also matches.  The oracle recomputes both verdicts
    from the generating arithmetic, so the hash certifies the semantic
    DIFFERENCE, not just one side.

    Plan: one scan, row-local higher-order predicates over a real
    array<struct> column, zero shuffle, no explode."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    tagged = ev.select("event_id", F.expr(_VS_TAGS_SPARK).alias("tags"))
    nested = F.expr("exists(tags, x -> x.type = 'p' AND x.value = 'p3')")
    obj = F.expr("exists(tags, x -> x.type = 'p')") & F.expr(
        "exists(tags, x -> x.value = 'p3')"
    )
    return tagged.select(
        "event_id",
        nested.alias("nested_match"),
        obj.alias("object_match"),
    ).filter(F.col("object_match"))


# --------------------------------------------------------------------------
# adjacency_matrix_agg  (ES adjacency_matrix aggregation)
# --------------------------------------------------------------------------

# Named filters over documents; ES returns a doc count per filter and per
# pairwise intersection (the co-occurrence "matrix" behind graph/Venn
# dashboards).  Intersections of named predicates compile to one narrow
# pass: each filter is a boolean column, every matrix cell a SUM of a
# boolean product — no join, no explode, one global aggregate.
_ADJ_FILTERS = {
    "en": "lang = 'en'",
    "long": "n_chars > 300",
    "sparky": "text LIKE '%spark%'",
}

_ADJ_CELLS = []  # (key, predicate-product SQL) in ES's emission order
for _i, (_ka, _pa) in enumerate(sorted(_ADJ_FILTERS.items())):
    for _kb, _pb in sorted(_ADJ_FILTERS.items())[_i:]:
        _key = _ka if _ka == _kb else f"{_ka}&{_kb}"
        _ADJ_CELLS.append(
            (_key, f"CAST(({_pa}) AND ({_pb}) AS INT)")
        )

_ADJ_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{k}' AS cell, CAST(SUM({expr}) AS BIGINT) AS doc_count FROM documents"
    for k, expr in _ADJ_CELLS
)


@register("adjacency_matrix_agg", _ADJ_ORACLE)
def adjacency_matrix_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: doc counts for three named
    filters and every pairwise intersection (upper triangle, ES's
    ``a&b`` key convention).  One scan, six conditional sums, zero
    shuffles beyond the single global aggregate — output is
    filter-count bounded (n*(n+1)/2 cells), never data-sized."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    agg = docs.agg(
        *[
            F.sum(F.expr(expr)).cast("bigint").alias(f"c{i}")
            for i, (_, expr) in enumerate(_ADJ_CELLS)
        ]
    )
    # unpivot the single aggregate row into (cell, doc_count) rows
    stack = ", ".join(
        f"'{k}', c{i}" for i, (k, _) in enumerate(_ADJ_CELLS)
    )
    return agg.selectExpr(
        f"stack({len(_ADJ_CELLS)}, {stack}) AS (cell, doc_count)"
    )


# --------------------------------------------------------------------------
# percentile_ranks_agg  (ES percentile_ranks aggregation, exact)
# --------------------------------------------------------------------------

# ES's percentile_ranks asks the inverse question of percentiles: "what
# fraction of values sit at or below v?" for caller-chosen thresholds.
# ES approximates with t-digest; over sorted columnar data the EXACT
# answer is one conditional-mean pass per threshold, so the engine
# certifies exact values (the same stance as histogram_quantile_merge
# vs percentile_approx).
_PR_VALUES = [1000.0, 5000.0, 25000.0]

_PR_TERMS_SQL = ", ".join(
    f"ROUND(AVG(CASE WHEN o_totalprice <= {v} THEN 100.0 ELSE 0.0 END), 6)"
    f" AS pr_{int(v)}"
    for v in _PR_VALUES
)

_PR_ORACLE = f"""
SELECT o_orderpriority, {_PR_TERMS_SQL}
FROM orders
GROUP BY o_orderpriority
"""


@register("percentile_ranks_agg", _PR_ORACLE)
def percentile_ranks_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``percentile_ranks`` over o_totalprice per order priority:
    the percentage of orders at or below each caller threshold.  One
    grouped aggregate with three conditional means — group-cardinality
    output, partial aggregation map-side, no second pass."""
    tune(spark)
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        *[
            F.round(
                F.avg(
                    F.when(F.col("o_totalprice") <= v, 100.0).otherwise(0.0)
                ),
                6,
            ).alias(f"pr_{int(v)}")
            for v in _PR_VALUES
        ]
    )


# --------------------------------------------------------------------------
# date_range_agg  (ES date_range aggregation)
# --------------------------------------------------------------------------

# Named, possibly-unbounded calendar buckets (ES semantics: `from`
# inclusive, `to` exclusive) with a count and a metric per bucket —
# the "era breakdown" dashboards ask of a dated index.  One CASE
# expression + one grouped aggregate; bucket count is fixed by the
# request, never data-sized.
_DR_EDGES = ("1997-01-01", "1999-01-01")

_DR_BUCKET_SQL = f"""CASE
  WHEN o_orderdate <  DATE '{_DR_EDGES[0]}' THEN '*-{_DR_EDGES[0]}'
  WHEN o_orderdate >= DATE '{_DR_EDGES[1]}' THEN '{_DR_EDGES[1]}-*'
  ELSE '{_DR_EDGES[0]}-{_DR_EDGES[1]}'
END"""

_DR_ORACLE = f"""
SELECT {_DR_BUCKET_SQL} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY 1
"""


@register("date_range_agg", _DR_ORACLE)
def date_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``date_range`` aggregation: three named buckets (open-ended
    head and tail) over o_orderdate, each with a doc count and an
    exact-decimal revenue sum.  Map-side partial aggregation into three
    groups — the 100 TB cost is the scan."""
    tune(spark)
    orders = t(spark, sf_dir, "orders")
    return (
        orders.withColumn("bucket", F.expr(_DR_BUCKET_SQL))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("doc_count"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# has_child_query  (ES parent-child join field: has_child with min_children)
# --------------------------------------------------------------------------

# ES's OTHER document relation (besides nested): the `join` field maps a
# parent type to child documents in the same index, and `has_child`
# returns PARENTS whose children match a query — with min_children /
# max_children bounds and a score_mode folding child relevance into the
# parent.  orders/lineitem IS that relation (o_orderkey <- l_orderkey).
# Here: parents with >= _HC_MIN children matching l_quantity >= _HC_QTY,
# score_mode=sum over the matching children's quantity (deterministic
# integer-valued doubles), plus max for the score_mode=max sibling.
_HC_QTY = 30
_HC_MIN = 3

_HAS_CHILD_ORACLE = f"""
WITH matched AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_children,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS score_sum,
         CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS score_max
  FROM lineitem
  WHERE l_quantity >= {_HC_QTY}
  GROUP BY l_orderkey
)
SELECT o.o_orderkey, o.o_orderstatus, m.n_children, m.score_sum,
       m.score_max
FROM orders o JOIN matched m ON m.l_orderkey = o.o_orderkey
WHERE m.n_children >= {_HC_MIN}
"""


@register("has_child_query", _HAS_CHILD_ORACLE)
def has_child_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``has_child``: parents (orders) having at least min_children
    ({m}) children (lineitems) matching the child query (quantity >=
    {q}), carrying both score_mode=sum and score_mode=max folds of the
    child scores (the quantity itself — integral, so the folds are
    exact on both engines).

    Plan — the scalable has_child shape: the child query filters and
    AGGREGATES FIRST (map-side combined, one shuffle keyed by parent
    id), so the join to the parent table moves one row per CANDIDATE
    parent, never raw children; min_children prunes before the join.
    At 100 TB this is a pre-aggregated shuffle join on the natural
    key — no skew beyond the parent key's own distribution, AQE
    handles stragglers."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    matched = (
        li.filter(F.col("l_quantity") >= _HC_QTY)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_children"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("score_sum"),
            F.max(F.col("l_quantity").cast("bigint")).alias("score_max"),
        )
        .filter(F.col("n_children") >= _HC_MIN)
    )
    return o.join(
        matched, matched.l_orderkey == o.o_orderkey
    ).select(
        "o_orderkey", "o_orderstatus", "n_children", "score_sum", "score_max"
    )
