"""Third tranche of TPC-H-shaped queries: Q2, Q8, Q9, Q11, Q16, Q20, Q21,
adapted to the synthetic schema.  The biggest adaptation: there is no
``partsupp`` table, so the part<->supplier relation is derived from
``lineitem`` (DISTINCT (l_partkey, l_suppkey), with unit cost
``l_extendedprice / l_quantity`` standing in for ps_supplycost and
shipped quantity standing in for ps_availqty).  Substitutions are noted
per query.

Plan shapes this tranche adds over tpch.py / tpch2.py:

  Q2  — per-group MIN joined back on (group, min) — argmin-per-key over a
        derived relation, four-table star on the lookup side
  Q8  — market-share: two conditional exact-decimal sums ratioed per year,
        over a 6-table star spanning two independent nation lookups
  Q9  — profit expression mixing fact columns with a broadcast dimension
        column, grouped by (nation, year)
  Q11 — grouped value vs a scalar fraction of its own global total
  Q16 — COUNT(DISTINCT) over a derived relation with an anti-join
        exclusion list
  Q20 — nested semi-join chain: supplier <- (grouped HAVING over a
        LIKE-filtered part join)
  Q21 — one semi-join AND one anti-join against the same fact table with
        different correlated predicates (sole-blame supplier)

All hash-certified vs DuckDB via the exact-decimal helpers
(functions/exact.py).  The reference implements none of these (it is an
ingest connector, SURVEY §2A); they certify subquery decorrelation,
argmin-join, and ratio-of-aggregates planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# tpch_q2  (minimum cost supplier)
# --------------------------------------------------------------------------

# Adapted: partsupp -> per-(part, supplier) MIN(l_extendedprice /
# l_quantity) derived from lineitem ("observed unit cost"); the original's
# p_type LIKE '%BRASS' / p_size = 15 become p_type = 'LARGE' /
# p_size = 25; region EUROPE kept.

_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
costs AS (
  SELECT p.p_partkey, eu.s_suppkey, eu.s_name, eu.s_acctbal, eu.n_name,
         ps.unit_cost,
         MIN(ps.unit_cost) OVER (PARTITION BY p.p_partkey) AS min_cost
  FROM part p
  JOIN ps ON ps.l_partkey = p.p_partkey
  JOIN eu ON eu.s_suppkey = ps.l_suppkey
  WHERE p.p_type = 'LARGE' AND p.p_size = 25
)
SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
FROM costs WHERE unit_cost = min_cost
"""


@register("tpch_q2", _Q2_ORACLE)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: for each qualifying part, the EUROPE supplier(s) offering the
    minimum observed unit cost.  The argmin-per-part is a window MIN
    over the already-joined frame (one shuffle on p_partkey) rather
    than a groupBy + self-join, so the derived part-supplier relation
    is built and shuffled once.  part and the 100-row supplier side
    are broadcast; the only wide shuffle is ps's groupBy, whose keys
    (partkey, suppkey) are near-unique and skew-free.

    Double division and MIN are bit-exact cross-engine, so the min-cost
    equality certifies without decimal scaffolding."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), n.n_nationkey == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == n.n_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") == 25)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey")
    costs = (
        ps.join(F.broadcast(p), p.p_partkey == ps.l_partkey)
        .join(F.broadcast(eu), F.col("s_suppkey") == ps.l_suppkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
    )
    return costs.filter(F.col("unit_cost") == F.col("min_cost")).select(
        "s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost"
    )


# --------------------------------------------------------------------------
# tpch_q8  (national market share)
# --------------------------------------------------------------------------

# Adapted: market region ASIA, supplier nation NATION_3, p_type ECONOMY;
# the original's mktsegment/date window trimmed to the 1996-1997 years.

_Q8_ORACLE = f"""
WITH vols AS (
  SELECT
    CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
    l.l_extendedprice * (1 - l.l_discount) AS volume,
    sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o    ON o.o_orderkey = l.l_orderkey
  JOIN customer c  ON c.c_custkey = o.o_custkey
  JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
  JOIN region r    ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s  ON s.s_suppkey = l.l_suppkey
  JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
  JOIN part p      ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT
  o_year,
  {SUMD("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END", 6, 18)}
    / {SUMD('volume', 6, 18)} AS mkt_share
FROM vols
GROUP BY o_year
"""


@register("tpch_q8", _Q8_ORACLE)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of ECONOMY-part revenue sold into ASIA, per
    order year.  Six broadcast joins (every dimension is tiny) hang off
    the lineitem<->orders shuffle join — the single wide exchange.  The
    share is a ratio of two conditional exact-decimal sums computed in
    one aggregation pass; both sums round to 2 decimals before the
    double division, so the ratio is bit-identical cross-engine."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    vols = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), cn.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), F.col("r_regionkey") == cn.n_regionkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_nationkey") == s.s_nationkey)
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)
    return vols.groupBy("o_year").agg(
        (dsum(nat, 6, 18) / dsum("volume", 6, 18)).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# tpch_q9  (product type profit)
# --------------------------------------------------------------------------

# Adapted: ps_supplycost -> 0.6 * p_retailprice ("standard cost" carried
# on the part dimension); p_name LIKE '%green%' kept in spirit via the
# synthetic p_name word list ('red %' parts).

_Q9_ORACLE = f"""
SELECT
  sn.n_name AS nation,
  CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
  {SUMD('l.l_extendedprice * (1 - l.l_discount)'
        ' - 0.6 * p.p_retailprice * l.l_quantity', 6, 18)} AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE 'red %'
GROUP BY sn.n_name, CAST(YEAR(o.o_orderdate) AS BIGINT)
"""


@register("tpch_q9", _Q9_ORACLE)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit on red parts by supplier nation and year, where cost
    is a dimension-carried standard cost (0.6 * p_retailprice).  The
    LIKE-filtered part table is broadcast, so the selective predicate
    prunes lineitem rows before the only wide shuffle (the join to
    orders); profit mixes fact and dimension columns in one exact-
    decimal sum."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("red %"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), sn.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit, 6, 18).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# tpch_q11  (important stock identification)
# --------------------------------------------------------------------------

# Adapted: ps_supplycost * ps_availqty -> shipped value
# l_extendedprice * l_quantity from lineitem; supplier nation GERMANY ->
# NATION_7; fraction 0.0001 scaled to the synthetic row counts (0.001).

_Q11_VALUE = """
  SELECT l.l_partkey, SUM(CAST(l.l_extendedprice * l.l_quantity
                               AS DECIMAL(18,2))) AS dec_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey = 7
  GROUP BY l.l_partkey
"""

_Q11_ORACLE = f"""
WITH value_by_part AS ({_Q11_VALUE})
SELECT l_partkey, CAST(dec_value AS DOUBLE) AS part_value
FROM value_by_part
WHERE dec_value > (SELECT SUM(dec_value) * 0.001 FROM value_by_part)
"""


@register("tpch_q11", _Q11_ORACLE)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose NATION_7-supplied shipped value exceeds 0.1% of
    the national total.  The grouped value is computed once, and the
    scalar total re-aggregates the *grouped* frame (2000 rows), not the
    fact table — then broadcasts back as a 1-row cross join.  The
    threshold comparison stays in exact decimal (no double rounding)
    so the > is bit-identical cross-engine; only the output column is
    cast to double."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    value = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,2)")
            ).alias("dec_value")
        )
    )
    total = value.agg((F.sum("dec_value") * F.lit(0.001)).alias("threshold"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("dec_value") > F.col("threshold"))
        .select("l_partkey", F.col("dec_value").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# tpch_q16  (part/supplier relationship count)
# --------------------------------------------------------------------------

# Adapted: partsupp -> DISTINCT (l_partkey, l_suppkey) from lineitem;
# the "complaints" exclusion list -> suppliers with negative s_acctbal;
# brand/type/size exclusions mapped onto the synthetic vocabulary.

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("tpch_q16", _Q16_ORACLE)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: how many distinct reputable suppliers stock each qualifying
    (brand, type, size).  The distinct part-supplier relation is the
    one wide shuffle; the negative-balance exclusion is a broadcast
    anti-join *before* the distinct so excluded suppliers never enter
    the aggregation.  COUNT(DISTINCT) over the pre-distinct relation
    plans as a single-pass partial aggregate (already unique pairs)."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    pairs = (
        li.join(F.broadcast(bad), bad.s_suppkey == li.l_suppkey, "left_anti")
        .distinct()
    )
    return (
        pairs.join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# tpch_q20  (potential part promotion)
# --------------------------------------------------------------------------

# Adapted: availqty > 0.5 * shipped-qty becomes "shipped more than 50
# units of some 'small %' part during 1996"; nation CANADA -> regionkey 1.

_Q20_ORACLE = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = 1
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small %'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(l.l_quantity) > 50.0
  )
"""


@register("tpch_q20", _Q20_ORACLE)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: region-1 suppliers who moved >50 units of a single 'small'
    part in 1996.  The inner grouped-HAVING relation reduces lineitem
    before any join to supplier; the IN decorrelates to a LEFT SEMI
    join whose build side is at most |supplier| rows.  Quantities are
    integral doubles, so SUM and the >50 comparison are exact."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small %"))
    movers = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
    )
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
        .join(movers, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# tpch_q21  (suppliers who kept orders waiting)
# --------------------------------------------------------------------------

# Adapted: "late" (l_receiptdate > l_commitdate) becomes l_shipdate >
# o_orderdate + 90 days; nation SAUDI ARABIA -> nationkey < 5.

_Q21_ORACLE = """
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, COUNT(*) AS numwait
FROM li l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.late
  AND s.s_nationkey < 5
  AND EXISTS (
    SELECT 1 FROM li l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM li l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.late
  )
GROUP BY s.s_name
"""


@register("tpch_q21", _Q21_ORACLE)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: suppliers solely to blame for a finished order shipping
    late — their line was late, the order had other suppliers, and no
    other supplier's line was late.  Instead of the textbook
    EXISTS + NOT EXISTS pair (two extra shuffled self-joins on a
    100 TB fact table), both order-level facts are computed in ONE
    pass with window aggregates over l_orderkey — supplier count and
    late-supplier count per order — then turned into row-local
    predicates.  Same result, one shuffle on l_orderkey instead of
    three."""
    tune(spark)
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn(
            "late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "late")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    per_order = (
        li.withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "late_supps",
            F.size(
                F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
            ),
        )
    )
    # sole blame: this line late, >1 supplier on the order, and the only
    # late supplier is this one (late_supps == 1 and it includes us)
    blamed = per_order.filter(
        F.col("late") & (F.col("n_supps") > 1) & (F.col("late_supps") == 1)
    )
    s = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    return (
        blamed.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
