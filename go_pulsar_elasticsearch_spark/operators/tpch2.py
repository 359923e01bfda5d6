"""Second tranche of TPC-H-shaped queries: Q4, Q12, Q15, Q17, Q19, Q22,
adapted to the synthetic schema (no l_commitdate / l_receiptdate /
l_shipmode / partsupp / c_phone — substitutions noted per query).

Each exercises a distinct plan shape the first tranche (tpch.py) does
not cover:

  Q4  — EXISTS-style semi-join with an inequality residual condition
  Q12 — conditional two-way counts over a join (CASE inside SUM)
  Q15 — aggregate-of-aggregate: join back against the max of a grouped sum
  Q17 — correlated scalar subquery -> per-group average joined back
  Q19 — disjunction of conjunctions (OR-of-ANDs) spanning both join sides
  Q22 — scalar-subquery threshold + anti-join

All hash-certified vs DuckDB via the exact-decimal summation helpers
(functions/exact.py).  The reference implements none of these (it is an
ingest connector, see SURVEY §2A); they certify the relational engine's
subquery/semi/anti planning the way TPC-H intended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import AVGD, SUMD, davg, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# tpch_q4  (order priority checking)
# --------------------------------------------------------------------------

# Adapted: the original's l_commitdate < l_receiptdate ("late") becomes
# l_shipdate > o_orderdate + 60 days ("slow to ship").

_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
"""


@register("tpch_q4", _Q4_ORACLE)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: orders in a quarter with at least one slow-shipping line,
    counted by priority.  The EXISTS plans as a LEFT SEMI join on
    l_orderkey with the inequality as a residual — one shuffle, no
    row duplication from multi-line orders (the trap a plain inner
    join + distinct would hit)."""
    tune(spark)
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, slow, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# tpch_q12  (shipping-mode priority split)
# --------------------------------------------------------------------------

# Adapted: GROUP BY l_shipmode becomes GROUP BY l_linestatus.

_Q12_ORACLE = """
SELECT
  l.l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
"""


@register("tpch_q12", _Q12_ORACLE)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: per line-status, how many lines belong to high- vs
    low-priority orders — both counts ride one aggregation pass
    (CASE inside SUM), so the join output is scanned once."""
    tune(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# tpch_q15  (top supplier by quarterly revenue)
# --------------------------------------------------------------------------

_Q15_REV = f"""
  SELECT l_suppkey,
         {SUMD('l_extendedprice * (1 - l_discount)', 6, 18)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
"""

_Q15_ORACLE = f"""
WITH revenue AS ({_Q15_REV})
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("tpch_q15", _Q15_ORACLE)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the supplier(s) achieving the maximum quarterly revenue.
    The scalar MAX over the grouped sum is a 1-row broadcast joined
    back against the same aggregate (computed once per branch — at
    scale, .cache() the revenue frame; equality on the exact-decimal
    double is deterministic in both engines)."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, 18).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# tpch_q17  (small-quantity-order revenue)
# --------------------------------------------------------------------------

_Q17_ORACLE = f"""
WITH part_avg AS (
  SELECT l_partkey, 0.2 * {AVGD('l_quantity', 1)} AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT {SUMD('l.l_extendedprice', 2, 18)} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < a.qty_threshold
"""


@register("tpch_q17", _Q17_ORACLE)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost to small orders of one brand — the correlated
    scalar subquery (per-part average quantity) decorrelates into a
    grouped aggregate joined back on l_partkey.  part is broadcast;
    the per-part averages shuffle once on l_partkey (at 100 TB the
    brand filter should semi-join-prune the average build too —
    Catalyst's DPP does this on partitioned part tables)."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * davg("l_quantity", 1)).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(part_avg, F.col("a_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice", 2, 18) / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# tpch_q19  (discounted revenue, disjunctive brand/size/qty bands)
# --------------------------------------------------------------------------

# Adapted: container/shipmode predicates become p_size bands.

_Q19_ORACLE = f"""
SELECT {SUMD('l.l_extendedprice * (1 - l.l_discount)', 6, 18)} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE
     (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
      AND l.l_quantity >= 1 AND l.l_quantity <= 11)
  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
      AND l.l_quantity >= 10 AND l.l_quantity <= 20)
  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
      AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register("tpch_q19", _Q19_ORACLE)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-ANDs spanning both join sides.  Catalyst extracts the
    common single-side conjuncts (p_brand IN (...), l_quantity <= 30)
    below the join as pushed filters, keeping the full disjunction as
    the residual — check .explain() for PushedFilters on both scans."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, 18).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# tpch_q22  (global sales opportunity)
# --------------------------------------------------------------------------

# Adapted: country code substring(c_phone,1,2) becomes c_nationkey, and
# "has no orders" (vacuous here — every synthetic customer has orders)
# becomes "never placed an URGENT order".

_Q22_NATIONS = "(1, 3, 5, 7, 9, 11, 13)"

_Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT {AVGD('c_acctbal', 2)} AS threshold
  FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey IN {_Q22_NATIONS}
)
SELECT
  c.c_nationkey AS cntrycode,
  COUNT(*) AS numcust,
  {SUMD('c.c_acctbal', 2)} AS totacctbal
FROM customer c, avg_bal
WHERE c.c_nationkey IN {_Q22_NATIONS}
  AND c.c_acctbal > avg_bal.threshold
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_nationkey
"""


@register("tpch_q22", _Q22_ORACLE)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: wealthy-but-inactive customers per country.  The scalar
    average is a 1-row broadcast cross join (never a collect); the NOT
    EXISTS is a LEFT ANTI join against the pre-filtered orders —
    filter-before-anti keeps the build side small."""
    tune(spark)
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", 2).alias("threshold")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(urgent, urgent.o_custkey == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )
