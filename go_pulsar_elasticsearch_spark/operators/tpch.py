"""TPC-H-shaped benchmark queries beyond the flagship (Q1 ≡ agg_grouped,
Q3 ≡ sql_surface_q3): Q5 (local supplier volume), Q6 (forecast revenue),
Q7 (volume shipping), Q10 (returned items), Q13 (order-count
distribution), Q14 (promotion effect), Q18 (large-volume customers).
Classic multi-join + aggregation shapes over the fixture star schema,
all hash-certified.  (Q4/Q12/Q16 etc. need columns the synthetic tables
don't carry — l_commitdate, l_shipmode, partsupp — so variants are
adapted to the available schema where noted.)

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
# tpch_q6  (forecasting revenue change)
# --------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {SUMD('l_extendedprice * l_discount', 6, 18)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6", _Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: single-table filter + global sum — the pure pushdown showcase.
    All three predicates reach the parquet scan (PushedFilters); the agg
    is a two-stage partial/final with one row crossing the exchange.
    (Discounts are exact two-decimal doubles in both engines, so the
    BETWEEN on double literals matches bit-for-bit.)"""
    tune(spark)
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 6, 18).alias("revenue")
    )


# --------------------------------------------------------------------------
# tpch_q7  (volume shipping between two nations)
# --------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
  {SUMD('l.l_extendedprice * (1 - l.l_discount)', 6, 18)} AS revenue
FROM supplier s
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


@register("tpch_q7", _Q7_ORACLE)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume by year.  The nation-pair disjunction
    rides the two broadcast joins (nation is tiny) and prunes most rows
    before the big lineitem⋈orders shuffle join."""
    tune(spark)
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
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
# tpch_q13  (customer order-count distribution, adapted)
# --------------------------------------------------------------------------

_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


@register("tpch_q13", _Q13_ORACLE)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: how many customers placed k orders — outer join whose filter
    lives in the join condition (customers with zero matches must
    survive), then a second aggregation over the first.  Adapted: the
    original's o_comment NOT LIKE filter becomes o_orderpriority <>
    '1-URGENT' (synthetic orders carry no comment column)."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# tpch_q14  (promotion effect)
# --------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT
  100.0 * {SUMD("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 6, 18)}
        / {SUMD('l.l_extendedprice * (1 - l.l_discount)', 6, 18)} AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01'
"""


@register("tpch_q14", _Q14_ORACLE)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: share of revenue from promo parts in one month — conditional
    aggregate ratio.  part broadcasts; both sums ride a single pass, and
    the final ratio is one double division of two exact decimals."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    return joined.agg(
        (F.lit(100.0) * dsum(promo, 6, 18) / dsum(revenue, 6, 18)).alias(
            "promo_revenue"
        )
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
