"""Projection / filter / scalar-function operators (SURVEY.md §2B).

These certify the expression surface the reference's single projection
(`pkg/model/model.go:28-44` ToIndex) only hints at: rename/cast, predicate
pushdown, string/date/math/conditional/array/JSON functions.

Scale notes: everything here is a narrow per-row transform — no shuffle.
Filters and column selections are expressed declaratively so Catalyst
pushes them into the parquet scan (verify with .explain: PushedFilters /
ReadSchema).  Cross-engine hash-match rules used throughout:
- double->int casts differ (Spark truncates, DuckDB rounds): always go
  through FLOOR and cast explicitly on both sides.
- Spark size()/length() return INT where DuckDB len() returns BIGINT:
  cast to BIGINT on the Spark side.
- transcendentals (ln/exp/log10) may differ in the last ulp between
  libm and the JVM: round(…, 6) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# project_rename_cast
# --------------------------------------------------------------------------

_PROJECT_ORACLE = """
SELECT
  l_orderkey,
  CAST(l_linenumber AS BIGINT) AS line_no,
  CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
  l_extendedprice AS price,
  l_returnflag || '/' || l_linestatus AS flag_status,
  date_trunc('day', l_shipdate) AS ship_date
FROM lineitem
"""


@register("project_rename_cast", _PROJECT_ORACLE)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT/alias/cast — narrow projection; scan should prune to the six
    referenced columns (check ReadSchema)."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_no"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").alias("price"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        F.date_trunc("day", "l_shipdate").alias("ship_date"),
    )


# --------------------------------------------------------------------------
# filter_predicates
# --------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_shipdate
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 45
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate < TIMESTAMP '1999-06-01'
  AND NOT (l_discount > 0.05)
  AND l_linestatus LIKE 'F%'
  AND l_orderkey IS NOT NULL
"""


@register("filter_predicates", _FILTER_ORACLE)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """=,<,BETWEEN,IN,LIKE,AND/OR/NOT,IS NULL — all plan as data filters
    that Catalyst pushes into the parquet scan (PushedFilters)."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 45)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") < F.lit("1999-06-01").cast("timestamp"))
        & ~(F.col("l_discount") > 0.05)
        & F.col("l_linestatus").like("F%")
        & F.col("l_orderkey").isNotNull()
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_shipdate",
    )


# --------------------------------------------------------------------------
# string_funcs
# --------------------------------------------------------------------------

_STRING_ORACLE = r"""
SELECT
  doc_id,
  upper(lang) AS lang_up,
  lower(source) AS source_lo,
  substr(text, 1, 20) AS head20,
  CAST(length(text) AS BIGINT) AS text_len,
  lang || '-' || source AS lang_source,
  trim('  ' || lang || '  ') AS lang_trim,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  regexp_extract(text, '^(\w+)', 1) AS first_word,
  replace(substr(text, 1, 30), ' ', '_') AS head_snake,
  CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos
FROM documents
"""


@register("string_funcs", _STRING_ORACLE)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/length/concat/trim/split/regexp/instr."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("source_lo"),
        F.substring("text", 1, 20).alias("head20"),
        F.length("text").cast("bigint").alias("text_len"),
        F.concat_ws("-", "lang", "source").alias("lang_source"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trim"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.replace(F.substring("text", 1, 30), F.lit(" "), F.lit("_")).alias("head_snake"),
        F.instr(F.col("text"), "spark").cast("bigint").alias("spark_pos"),
    )


# --------------------------------------------------------------------------
# date_funcs
# --------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(month(o_orderdate) AS INTEGER) AS o_month,
  CAST(day(o_orderdate) AS INTEGER) AS o_day,
  date_trunc('month', o_orderdate) AS month_start,
  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS o_date,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
  CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders
"""


@register("date_funcs", _DATE_ORACLE)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/datediff/to_date/unix_timestamp/date_add."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.to_date("o_orderdate").cast("timestamp").alias("o_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_add(F.to_date("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.last_day(F.to_date("o_orderdate")).cast("timestamp").alias("month_end"),
    )


# --------------------------------------------------------------------------
# math_funcs
# --------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  round(l_extendedprice, 1) AS price_r1,
  abs(l_discount - 0.05) AS disc_dev,
  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
  sqrt(l_quantity) AS qty_sqrt,
  round(ln(l_extendedprice), 6) AS price_ln,
  l_quantity * l_quantity AS qty_sq,
  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
"""


@register("math_funcs", _MATH_ORACLE)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/power/mod.  sqrt is correctly rounded
    everywhere (safe raw); ln is rounded to 6 places on both sides."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


# --------------------------------------------------------------------------
# conditional
# --------------------------------------------------------------------------

_COND_ORACLE = """
SELECT
  c_custkey,
  CASE
    WHEN c_acctbal < 0 THEN 'overdrawn'
    WHEN c_acctbal < 5000 THEN 'standard'
    ELSE 'premium'
  END AS tier,
  coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS segment_or_other,
  greatest(c_acctbal, 0.0) AS bal_clamped,
  least(c_acctbal, 1000.0) AS bal_capped,
  CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS odd_nation
FROM customer
"""


@register("conditional", _COND_ORACLE)
def conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, greatest, least."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_clamped"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_capped"),
        F.when(F.col("c_nationkey") % 2 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("c_nationkey"))
        .alias("odd_nation"),
    )


# --------------------------------------------------------------------------
# array_funcs
# --------------------------------------------------------------------------

_ARRAY_ORACLE = """
SELECT
  doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_words,
  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab,
  CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN) AS has_spark,
  string_split(text, ' ')[1] AS first_token
FROM documents
"""


@register("array_funcs", _ARRAY_ORACLE)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/size/array_distinct/sort_array/array_contains/element_at —
    all JVM higher-order array ops, no Python."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    # stage the token array once — five consumers would otherwise each
    # re-split the text (constant-factor, but free to avoid)
    return docs.select(
        "doc_id", F.split("text", " ").alias("words")
    ).select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.size(F.array_distinct("words")).cast("bigint").alias(
            "n_distinct_words"
        ),
        F.array_join(F.array_sort(F.array_distinct("words")), ",").alias(
            "vocab"
        ),
        F.array_contains("words", "spark").alias("has_spark"),
        F.element_at("words", 1).alias("first_token"),
    )


# --------------------------------------------------------------------------
# map_json_funcs
# --------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(props->>'k' AS INTEGER) AS k_int,
  CAST(json_extract_string(props, '$.k') IS NOT NULL AS BOOLEAN) AS has_k,
  CAST(props->>'k' AS INTEGER) * 2 AS k_doubled
FROM events
"""


@register("map_json_funcs", _JSON_ORACLE)
def map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json struct access over the events.props JSON
    string column (the reference's Avro payload decode, JSON-shaped)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        (k_int * 2).alias("k_doubled"),
    )


# --------------------------------------------------------------------------
# try_funcs  (ANSI-mode error-safe arithmetic: NULL, not job failure)
# --------------------------------------------------------------------------

# Spark 4 runs ANSI mode by default, so raw division-by-zero / overflow /
# out-of-range access THROW at runtime — on a 1000-executor job one bad
# row kills hours of work.  The idiomatic guard is the try_* family,
# which returns NULL for the failing row and lets the pipeline quarantine
# it (the batch-side mirror of the streaming DLQ split, R9).  The oracle
# spells the same semantics as explicit CASE guards, certifying that
# try_divide / try_add / try_element_at null out EXACTLY the rows the
# guards would.

_TRY_ORACLE = """
SELECT
  o.o_orderkey,
  CASE WHEN o.o_orderkey % 5 = 0 THEN NULL
       ELSE o.o_totalprice / (o.o_orderkey % 5) END AS safe_div,
  CASE WHEN o.o_orderkey % 10 > 7 THEN NULL
       ELSE 9223372036854775800 + o.o_orderkey % 10 END AS safe_add,
  CASE WHEN o.o_orderkey % 5 = 0 THEN TRUE ELSE FALSE END AS was_div0
FROM orders o
"""


@register("try_funcs", _TRY_ORACLE)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide (zero divisor -> NULL), try_add (bigint overflow ->
    NULL), and the quarantine flag a DLQ-style batch split would route
    on.  Stateless per-row; certified against explicit CASE guards."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    divisor = F.col("o_orderkey") % 5
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), divisor).alias("safe_div"),
        F.try_add(
            F.lit(9223372036854775800), F.col("o_orderkey") % 10
        ).alias("safe_add"),
        (divisor == 0).alias("was_div0"),
    )


# --------------------------------------------------------------------------
# json_permissive_dlq  (PERMISSIVE decode + corrupt-record routing)
# --------------------------------------------------------------------------

# The reference's decode stage drops malformed records into an error
# path (R4, main.go:131-143); the JSON-domain analog is from_json's
# PERMISSIVE mode with columnNameOfCorruptRecord: bad payloads yield a
# null struct plus the RAW text in the corrupt column, so the DLQ
# branch is a filter, not an exception handler.  Every 7th event's
# props string is deterministically mangled (a leading '{', which both
# parsers reject — Spark's Jackson tolerates TRAILING garbage) to create
# the poison subset; the certified output pins the per-type good/bad
# counts, the parsed-field sum over good rows, and an md5 over the
# concatenated corrupt raws — proving the corrupt column carries the
# ORIGINAL bytes for replay, the same contract as dlq_split.
_JP_ORACLE = """
WITH mangled AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN '{' || props ELSE props END AS js
  FROM events
),
parsed AS (
  SELECT event_type,
         CASE WHEN json_valid(js)
              THEN CAST(json_extract_string(js, '$.k') AS BIGINT) END AS k,
         CASE WHEN NOT json_valid(js) THEN js END AS corrupt
  FROM mangled
)
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_good,
       CAST(COUNT(corrupt) AS BIGINT) AS n_corrupt,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       md5(string_agg(corrupt, '|' ORDER BY corrupt)) AS corrupt_md5
FROM parsed
GROUP BY event_type
"""


@register("json_permissive_dlq", _JP_ORACLE)
def json_permissive_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON decode with corrupt-record capture: good rows
    parse to a typed struct, poison rows land their raw text in the
    corrupt column, and both branches aggregate per event type.  One
    narrow from_json pass + one grouped aggregate — the plan cost of
    tolerating poison input is zero extra passes."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    mangled = ev.select(
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.concat(F.lit("{"), "props"))
        .otherwise(F.col("props"))
        .alias("js"),
    )
    parsed = mangled.select(
        "event_type",
        F.from_json(
            "js",
            "k bigint, _bad string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_bad"},
        ).alias("p"),
    ).select(
        "event_type",
        F.col("p.k").alias("k"),
        F.col("p._bad").alias("corrupt"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_good"),
        F.count("corrupt").alias("n_corrupt"),
        F.sum("k").alias("sum_k"),
        # NULL (not md5('')) when the group has no corrupt rows —
        # DuckDB's string_agg over all-NULL input is NULL
        F.when(
            F.count("corrupt") > 0,
            F.md5(
                F.array_join(F.array_sort(F.collect_list("corrupt")), "|")
            ),
        ).alias("corrupt_md5"),
    )
