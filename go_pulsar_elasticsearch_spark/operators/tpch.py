"""TPC-H-shaped benchmark queries beyond the flagship (Q1 ≡ agg_grouped,
Q3 ≡ sql_surface_q3): Q5 (local supplier volume), Q10 (returned items),
Q18 (large-volume customers).  Classic multi-join + aggregation shapes
over the fixture star schema, all hash-certified.

These stress the patterns 100 TB cares about: multiway joins with an
extra co-nationality equi condition (Q5), a selective date window
driving partition pruning (Q10), and a semi-join against an aggregated
subquery (Q18 — the IN-subquery becomes a left-semi join, the shape the
reference's ack matcher wanted to be, main.go:185-193)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# tpch_q5  (local supplier volume)
# --------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT
  n.n_name AS nation,
  {SUMD('l.l_extendedprice * (1 - l.l_discount)', 6, 18)} AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY n.n_name
"""


@register("tpch_q5", _Q5_ORACLE)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue where supplier and customer share a nation — the extra
    s_nationkey = c_nationkey equi condition rides the same join, no
    additional shuffle."""
    tune(spark)
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(revenue, 6, 18).alias("revenue"))
    )


# --------------------------------------------------------------------------
# tpch_q10  (returned item reporting)
# --------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT
  c.c_custkey,
  c.c_name,
  {SUMD('l.l_extendedprice * (1 - l.l_discount)', 6, 18)} AS revenue,
  c.c_acctbal,
  n.n_name AS nation
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("tpch_q10", _Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by lost (returned) revenue in a date window.
    The date filter prunes orders before the join; the top-k is a
    TakeOrderedAndProject over the aggregate, never a full sort."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(dsum(revenue, 6, 18).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# tpch_q18  (large-volume customers)
# --------------------------------------------------------------------------

_Q18_ORACLE = f"""
WITH big_orders AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,1))) > 150
)
SELECT
  c.c_name,
  c.c_custkey,
  o.o_orderkey,
  CAST(o.o_orderdate AS TIMESTAMP) AS o_date,
  o.o_totalprice,
  {SUMD('l.l_quantity', 1)} AS total_qty
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big_orders)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register("tpch_q18", _Q18_ORACLE)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers whose orders exceed 150 units — the IN-subquery
    over an aggregate plans as a left-semi join (the corrected shape of
    the reference's ack membership check)."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,1)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, c.c_custkey == F.col("o_custkey"))
        .join(li, li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("o_date"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity", 1).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_date", "o_totalprice", "total_qty"
        )
    )
