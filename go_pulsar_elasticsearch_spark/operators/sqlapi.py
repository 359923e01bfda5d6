"""SQL-API surface + remaining §2B expression coverage: GROUPING SETS,
collect_list/set aggregates, map functions, posexplode (lateral view),
and a full TPC-H-Q3-shaped query through spark.sql() over registered
views — proving the engine's second front door (SQL text) produces the
same certified plans as the DataFrame API."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import register_views, t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# agg_collect  (collect_list / collect_set, order-normalized)
# --------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT
  o_orderstatus,
  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
  CAST(len(list(DISTINCT o_orderpriority)) AS INTEGER) AS n_priorities,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_collect", _COLLECT_ORACLE)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array + array_join: set-valued aggregation with
    deterministic ordering (collect_* order is partition-dependent, so
    certified outputs always sort before use)."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    pris = F.array_sort(F.collect_set("o_orderpriority"))
    return o.groupBy("o_orderstatus").agg(
        F.array_join(pris, ",").alias("priorities"),
        F.size(pris).alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# agg_grouping_sets  (SQL text API)
# --------------------------------------------------------------------------

_GSETS_SQL = f"""
SELECT
  c_mktsegment AS segment,
  c_nationkey AS nationkey,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  {SUMD('c_acctbal')} AS total_balance
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
"""


@register("agg_grouping_sets", _GSETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through spark.sql() — the identical SQL text
    runs on DuckDB as the oracle."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_GSETS_SQL)


# --------------------------------------------------------------------------
# map_funcs
# --------------------------------------------------------------------------

_MAP_ORACLE = """
SELECT
  event_id,
  array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
  CAST(props->>'k' AS INTEGER) AS k_val,
  CAST(props->>'k' IS NOT NULL AS BOOLEAN) AS has_k
FROM events
"""


@register("map_funcs", _MAP_ORACLE)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into MapType + map_keys/size/element_at — the dynamic-
    schema twin of the struct-based map_json_funcs."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "k").isNotNull().alias("has_k"),
    )


# --------------------------------------------------------------------------
# explode_positions  (posexplode / lateral view)
# --------------------------------------------------------------------------

_POSEXPLODE_ORACLE = """
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] AS token
FROM (
  SELECT doc_id, w, unnest(range(1, least(len(w), 5) + 1)) AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
"""


@register("explode_positions", _POSEXPLODE_ORACLE)
def explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over the first 5 tokens per document (0-based position,
    matching Spark's posexplode convention)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "token"),
    )


# --------------------------------------------------------------------------
# sql_surface_q3  (TPC-H Q3 shape through spark.sql)
# --------------------------------------------------------------------------

_Q3_SQL = f"""
SELECT
  l.l_orderkey,
  {SUMD('l.l_extendedprice * (1 - l.l_discount)', 6, 18)} AS revenue,
  CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
  o.o_orderpriority
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate  > TIMESTAMP '1996-01-01'
GROUP BY l.l_orderkey, year(o.o_orderdate), o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
"""


@register("sql_surface_q3", _Q3_SQL)
def sql_surface_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority) via spark.sql over temp views —
    scan+filter+3-way join+agg+top-k in one SQL statement, same text on
    both engines."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


# --------------------------------------------------------------------------
# sql_surface_lateral  (CTE + LATERAL VIEW explode + window, one SQL text)
# --------------------------------------------------------------------------

# Spark spells table-generating functions as LATERAL VIEW; DuckDB as
# unnest — the only divergent clause, so the statement is kept in two
# dialect twins with identical semantics downstream.
_LATERAL_SPARK_SQL = """
WITH toks AS (
  SELECT doc_id, tok
  FROM documents
  LATERAL VIEW explode(split(text, ' ')) t AS tok
  WHERE tok != ''
), stats AS (
  SELECT doc_id,
         COUNT(*) AS n_toks,
         COUNT(DISTINCT tok) AS n_unique
  FROM toks GROUP BY doc_id
)
SELECT doc_id, n_toks, n_unique,
       DENSE_RANK() OVER (ORDER BY n_unique DESC) AS uniq_rank
FROM stats
"""

_LATERAL_ORACLE = """
WITH toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok != ''
), stats AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_toks,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_unique
  FROM toks GROUP BY doc_id
)
SELECT doc_id, n_toks, n_unique,
       CAST(DENSE_RANK() OVER (ORDER BY n_unique DESC) AS INTEGER) AS uniq_rank
FROM stats
"""


@register("sql_surface_lateral", _LATERAL_ORACLE)
def sql_surface_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text breadth: CTE + LATERAL VIEW table function + distinct
    aggregation + window rank in ONE statement through spark.sql —
    proving the engine's SQL front door handles the composite forms an
    analyst ships, not just DataFrame-built plans."""
    tune(spark)
    register_views(spark, sf_dir)
    out = spark.sql(_LATERAL_SPARK_SQL)
    from pyspark.sql import functions as F

    return out.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.col("n_unique").cast("long").alias("n_unique"),
        F.col("uniq_rank").cast("int").alias("uniq_rank"),
    )


# --------------------------------------------------------------------------
# variant_funcs  (Spark 4 VariantType: the semi-structured fast path)
# --------------------------------------------------------------------------

# Same logical answers as map_funcs' JSON extraction, but routed through
# Spark 4's VariantType (parse_json -> variant_get): the engine keeps a
# binary-shredded encoding instead of re-parsing JSON text per access,
# which is the 100 TB answer for wide semi-structured columns (one parse
# at ingest, typed sub-field access everywhere downstream).  The oracle
# extracts the same values from the JSON text, certifying that the
# variant path produces identical answers to a plain JSON reading.

_VARIANT_ORACLE = """
SELECT
  event_id,
  TRY_CAST(props->>'k' AS INTEGER) AS k_int,
  CAST(props->>'k' AS VARCHAR) AS k_str,
  TRY_CAST(props->>'missing' AS INTEGER) AS miss_val,
  CAST(TRY_CAST(props->>'k' AS INTEGER) IS NOT NULL AS BOOLEAN) AS has_k
FROM events
"""
# TRY_CAST mirrors try_variant_get: a non-integer k yields NULL on both
# sides instead of aborting the oracle run, and has_k means "k extracts
# AS INT" on both sides.


@register("variant_funcs", _VARIANT_ORACLE)
def variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json -> VariantType -> typed variant_get sub-field access
    (int and string casts, a missing path via try_variant_get, and an
    existence flag).  Stateless per-row — rides the scan at any SF."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("miss_val"),
        F.try_variant_get(v, "$.k", "int").isNotNull().alias("has_k"),
    )


# --------------------------------------------------------------------------
# sql_surface_pipe  (Spark 4 SQL pipe syntax |> — same answers as the
# classic GROUP BY the oracle runs)
# --------------------------------------------------------------------------

_PIPE_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,1))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
"""

_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,1))) AS DOUBLE) AS sum_qty
   GROUP BY l_returnflag
|> SELECT l_returnflag, n, sum_qty
"""


@register("sql_surface_pipe", _PIPE_ORACLE)
def sql_surface_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (`FROM t |> WHERE … |> AGGREGATE …`)
    through the front door, certified to produce exactly the classic
    GROUP BY's rows.  Pipe operators compile to the same logical plan
    as the nested form — Catalyst sees no difference, so every
    optimization (pushdown, partial agg) applies unchanged."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


# --------------------------------------------------------------------------
# sql_surface_recursive  (Spark 4 recursive CTE — bounded halving chain)
# --------------------------------------------------------------------------

_RECURSIVE_ORACLE = """
WITH RECURSIVE chain AS (
  SELECT n_nationkey AS start_key, n_nationkey AS k, 0 AS depth
  FROM nation
  UNION ALL
  SELECT start_key, CAST(FLOOR(k / 2) AS INTEGER), depth + 1
  FROM chain WHERE k > 0
)
SELECT CAST(start_key AS INTEGER) AS start_key,
       CAST(MAX(depth) AS INTEGER) AS chain_len,
       CAST(COUNT(*) AS BIGINT) AS n_steps,
       CAST(SUM(k) AS BIGINT) AS sum_keys
FROM chain GROUP BY start_key
"""


@register("sql_surface_recursive", _RECURSIVE_ORACLE)
def sql_surface_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through spark.sql (new in Spark 4): per-nation
    halving chain k -> floor(k/2) down to 0, aggregated to chain length
    + visited-key sum.  The IDENTICAL statement runs on DuckDB — both
    engines implement the SQL-standard recursive union semantics.
    FLOOR(k/2) rather than integer `/`: Spark's int division and
    DuckDB's differ in spelling (DIV vs //), floor is portable.

    Scale note: each recursion step is one self-union over the frontier
    — bounded here by log2(max key); unbounded recursions need the
    engine's row/depth limits (spark.sql.cteRecursionLevelLimit)."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_ORACLE)


# --------------------------------------------------------------------------
# collation_group  (Spark 4 collations: case-insensitive semantics as a
# column PROPERTY rather than scattered lower() calls)
# --------------------------------------------------------------------------

_COLLATE_ORACLE = """
SELECT lower(CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
         AS source_ci,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1
"""


@register("collation_group", _COLLATE_ORACLE)
def collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group mixed-case labels under the UTF8_LCASE collation (Spark 4):
    even doc_ids upper-case their source label, yet the collated groupBy
    merges them with the lower-case twins — no lower() in the grouping
    expression.  The grouping key's surfaced representative is
    engine/partition-dependent, so the certified output lowers it; the
    oracle is the classic lower() GROUP BY, proving the collation path
    computes the same partition of rows."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    label = F.when(
        F.col("doc_id") % 2 == 0, F.upper("source")
    ).otherwise(F.col("source"))
    return (
        docs.select(F.collate(label, "UTF8_LCASE").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_docs"))
        .select(F.lower("k").alias("source_ci"), "n_docs")
    )


# --------------------------------------------------------------------------
# agg_listagg  (Spark 4 LISTAGG ... WITHIN GROUP — ordered string agg)
# --------------------------------------------------------------------------

_LISTAGG_ORACLE = """
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
         AS segments,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY c_nationkey
"""

_LISTAGG_SPARK_SQL = """
SELECT c_nationkey,
       listagg(DISTINCT c_mktsegment, ',')
         WITHIN GROUP (ORDER BY c_mktsegment) AS segments,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
"""


@register("agg_listagg", _LISTAGG_ORACLE)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (SQL:2016, new in Spark 4): ordered,
    de-duplicated string aggregation as a first-class aggregate —
    replacing the array_sort(collect_set()) + array_join idiom
    (agg_collect above) with the standard spelling.  DuckDB's twin is
    string_agg(DISTINCT ... ORDER BY ...).  The WITHIN GROUP order makes
    the concatenation deterministic — collect_set alone is
    partition-order-dependent and must never be certified unsorted.

    Scale: same partial-aggregate shuffle as any groupBy; the per-group
    string is bounded by the distinct-value domain (segments: 5), never
    by row count — keep LISTAGG off unbounded-cardinality columns."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_LISTAGG_SPARK_SQL)


# --------------------------------------------------------------------------
# sql_surface_group_by_all  (GROUP BY ALL / ORDER BY ALL — one text, both
# engines)
# --------------------------------------------------------------------------

_GBALL_SQL = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("sql_surface_group_by_all", _GBALL_SQL)
def sql_surface_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL (the analyst's shorthand both Spark
    3.4+/4 and DuckDB implement): every non-aggregate select item is
    inferred as a grouping key, every output column as a sort key.  The
    IDENTICAL statement runs on both engines — the oracle IS the query
    text.  Catalyst expands ALL during analysis, so the optimized plan
    is byte-for-byte the explicit GROUP BY's — no semantic drift for the
    convenience."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_GBALL_SQL)


# --------------------------------------------------------------------------
# xml_funcs  (Spark 4 from_xml: XML ingestion without a jar)
# --------------------------------------------------------------------------

_XML_ORACLE = """
SELECT o_orderkey AS order_id,
       o_orderstatus AS status,
       o_totalprice AS price,
       'q1&q2' AS note,
       o_totalprice * 1.1 AS price_with_fee
FROM orders
WHERE o_orderpriority = '1-URGENT'
"""


@register("xml_funcs", _XML_ORACLE)
def xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (Spark 4 `to_xml` + `from_xml`): each order struct is
    SERIALIZED to an XML document by the engine's own writer, parsed
    back with a typed schema, and computed on.  The oracle recomputes
    every output from the ORIGINAL columns, so the hash certifies the
    full writer→parser round-trip: entity escaping both ways (the note
    carries a literal '&'), and Java double→string→double exactness
    (Double.toString is shortest-round-trip, parseDouble its exact
    inverse).

    Scale: narrow per-row expressions fused into the scan — the XML
    never shuffles; this is the shape for ingesting XML feeds (sitemap,
    RSS, legacy exports) without a spark-xml jar."""
    tune(spark)
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    doc = F.struct(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.lit("q1&q2").alias("note"),
    )
    xml = F.to_xml(doc)
    parsed = o.select(
        F.from_xml(
            xml, "order_id BIGINT, status STRING, price DOUBLE, note STRING"
        ).alias("p")
    )
    return parsed.select(
        F.col("p.order_id").alias("order_id"),
        F.col("p.status").alias("status"),
        F.col("p.price").alias("price"),
        F.col("p.note").alias("note"),
        (F.col("p.price") * 1.1).alias("price_with_fee"),
    )


# --------------------------------------------------------------------------
# sql_surface_not_in_nulls  (three-valued logic: NOT IN vs NOT EXISTS)
# --------------------------------------------------------------------------

_NOT_IN_NULLS_SQL = """
WITH probe AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
)
SELECT
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM probe)) AS BIGINT)
    AS not_in_cnt,
  CAST((SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM probe p
                          WHERE p.k = c.c_custkey)) AS BIGINT)
    AS not_exists_cnt,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey IN (SELECT k FROM probe)) AS BIGINT)
    AS in_cnt,
  CAST((SELECT COUNT(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM probe p
                      WHERE p.k = c.c_custkey)) AS BIGINT)
    AS exists_cnt
"""


@register("sql_surface_not_in_nulls", _NOT_IN_NULLS_SQL)
def sql_surface_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL three-valued logic where engines classically diverge: a NULL
    inside a NOT IN list makes every comparison UNKNOWN, so `NOT IN`
    must return ZERO rows while the intent-equivalent `NOT EXISTS`
    anti-joins correctly (nonzero here: the probe is urgent orders
    only, and plenty of customers never place one); `IN`/`EXISTS`
    agree because one TRUE match short-circuits the UNKNOWNs.  The
    probe list deliberately injects NULLs (every 97th order) and the
    IDENTICAL statement runs on both engines — certifying that the engine implements the ANSI trap, not
    a plausible-but-wrong anti join (Catalyst spells it null-aware:
    the plan gets a NullAwareAntiJoin / isnull-or disjunct, which is
    exactly the semantics users silently lose when hand-porting NOT IN
    to a plain anti join).

    At 100 TB this is also a PLAN statement: NOT EXISTS compiles to a
    shuffled left-anti hash join (scales), while NOT IN's null-aware
    form must broadcast the whole subquery side to every task — the
    certified divergence is the reason curated pipelines should write
    NOT EXISTS; this query documents both behaviors under one hash."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_NULLS_SQL)


# --------------------------------------------------------------------------
# sql_surface_exists_correlated  (correlated EXISTS / NOT EXISTS — one
# text, both engines; Catalyst's RewritePredicateSubquery turns them
# into left-semi / left-anti joins, the decorrelation every warehouse
# migration leans on)
# --------------------------------------------------------------------------

_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 300000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F'
                    AND o2.o_totalprice < 50000)
"""


@register("sql_surface_exists_correlated", _EXISTS_SQL)
def sql_surface_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one statement: customers with a
    big order and no small finished one.  The identical text runs on
    both engines; Spark decorrelates to one semi and one anti join on
    c_custkey (a single exchange each, no per-row subquery execution) —
    the plan shape that makes correlated predicates scale."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


# --------------------------------------------------------------------------
# sql_surface_scalar_subquery  (correlated scalar subquery in the select
# list — RewriteCorrelatedScalarSubquery: aggregate once per key, join
# back; NOT a per-row re-execution)
# --------------------------------------------------------------------------

_SCALAR_SUBQ_SQL = """
SELECT o.o_orderkey,
       o.o_totalprice,
       (SELECT MAX(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey) AS cust_max_price
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
"""


@register("sql_surface_scalar_subquery", _SCALAR_SUBQ_SQL)
def sql_surface_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every order next to its customer's lifetime max price via a
    correlated scalar subquery.  Catalyst decorrelates to ONE grouped
    aggregate over orders joined back on o_custkey — the rewrite that
    keeps select-list subqueries from becoming N executions.  MAX over
    doubles is order-insensitive and exact, so the identical text
    hash-matches DuckDB."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL)


# --------------------------------------------------------------------------
# sql_surface_window_clause  (named WINDOW definitions shared by several
# over() consumers — one text, both engines; Catalyst plans ONE Window
# node per distinct spec, so the shared name is also a shared exchange)
# --------------------------------------------------------------------------

_WINDOW_CLAUSE_SQL = """
SELECT o_custkey,
       o_orderkey,
       ROW_NUMBER() OVER w AS order_seq,
       LAG(o_orderkey) OVER w AS prev_orderkey,
       CAST(COUNT(*) OVER w_all AS BIGINT) AS cust_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_all
            AS DOUBLE) AS cust_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_all AS (PARTITION BY o_custkey)
"""


@register("sql_surface_window_clause", _WINDOW_CLAUSE_SQL)
def sql_surface_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard WINDOW clause: two named specs consumed by four
    window functions.  The identical statement runs on both engines
    (the oracle IS the query text); the partition sum goes through the
    exact-decimal cast so the unordered double accumulation can't
    diverge between engines.  Catalyst collapses same-spec functions
    into one Window node — both `w` consumers share one sort, both
    `w_all` consumers share one unordered pass, all on a single
    o_custkey exchange."""
    tune(spark)
    register_views(spark, sf_dir)
    return spark.sql(_WINDOW_CLAUSE_SQL)
