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
