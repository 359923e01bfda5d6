"""Sort / limit / top-k operators (SURVEY.md §2B).

Top-k via orderBy().limit(k) compiles to TakeOrderedAndProject: each task
keeps a k-row heap, the driver merges — no global sort, O(k) memory, the
only sane global ordering at 100 TB.  Full sorts are only certified with a
LIMIT for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_SORT_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@register("sort_multi_key", _SORT_ORACLE)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY (asc + desc) with unique tie-break, LIMIT 100."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy(F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_TOPK_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 10
"""


@register("limit_topk", _TOPK_ORACLE)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price -> TakeOrderedAndProject (heap per task)."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# zorder_layout  (space-filling-curve clustering key — the Delta/Iceberg
# OPTIMIZE ZORDER primitive for multi-column data skipping)
# --------------------------------------------------------------------------

_Z_BITS = 16


def _interleave_sql(x: str, y: str) -> str:
    """Morton code: bit i of x -> bit 2i, bit i of y -> bit 2i+1.
    Identical integer expression in Spark SQL and DuckDB."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZCODE = _interleave_sql(f"(l_partkey % {1 << _Z_BITS})",
                         f"(l_suppkey % {1 << _Z_BITS})")

_ZORDER_ORACLE = f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST({_ZCODE} AS BIGINT) AS zcode,
       CAST(({_ZCODE}) >> 20 AS BIGINT) AS zbucket
FROM lineitem
"""


@register("zorder_layout", _ZORDER_ORACLE)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (l_partkey, l_suppkey): interleave the
    low 16 bits of each into a Morton code, plus the write-bucket id
    (code >> 20).  Rows near each other on EITHER key land in the same
    bucket, so a repartitionByRange(zcode) write gives min/max file
    statistics that skip files for predicates on both columns — the
    multi-dimensional generalization of the reference's single-key daily
    partitioning (es.go:79-81).  Pure integer bit math: zero shuffles
    here; the layout write itself is one range shuffle."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.expr(_ZCODE).cast("long").alias("zcode"),
        F.expr(f"({_ZCODE}) >> 20").cast("long").alias("zbucket"),
    )


# --------------------------------------------------------------------------
# pareto_frontier  (skyline: non-dominated points, minimize price /
# maximize size)
# --------------------------------------------------------------------------

_PARETO_ORACLE = """
SELECT p.p_partkey, p.p_brand, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


@register("pareto_frontier", _PARETO_ORACLE)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts not dominated on (price low, size high) —
    the multi-objective shortlist shape (cheapest-per-capability).

    Two stages so the pairwise check never sees the full table:
    1. PRUNE (one groupBy shuffle): any row pricier than its size
       class's minimum is dominated by that minimum (same size,
       strictly cheaper) — only per-size price minima survive, i.e.
       at most |size domain| rows (+ exact price ties, which remain
       mutually non-dominating).  Result-identical by construction.
    2. Pairwise domination anti-join on the pruned set only — the
       broadcast side is bounded by the size-domain cardinality, not
       the table, so the quadratic term is O(|domain|^2) at ANY data
       scale."""
    tune(spark)
    p = t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    min_price = p.groupBy("p_size").agg(
        F.min("p_retailprice").alias("min_price")
    )
    pruned = p.join(F.broadcast(min_price), "p_size").filter(
        F.col("p_retailprice") == F.col("min_price")
    ).select("p_partkey", "p_brand", "p_retailprice", "p_size")
    q = pruned.select(
        F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & (
            (F.col("q_price") < F.col("p_retailprice"))
            | (F.col("q_size") > F.col("p_size"))
        )
    )
    return pruned.join(F.broadcast(q), dominated, "left_anti")
