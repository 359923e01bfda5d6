"""Join operators (SURVEY.md §2B).

The reference's only join is the O(n·m) ack-matcher nested loop
(`main.go:185-193`); here each join family is declared declaratively and
Catalyst picks broadcast-hash / shuffled-hash / sort-merge, with AQE
re-planning at runtime.

100 TB posture:
- `region`/`nation` are constant-size dimensions -> always broadcast().
- customer/orders/lineitem shuffle on their join keys; AQE skew-join
  handles hot keys.  In a real deployment, bucket lineitem+orders on
  orderkey to make this a shuffle-free co-located join.
- semi/anti joins are expressed as left_semi/left_anti so Spark can avoid
  materializing the probe side's payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# join_inner_equi
# --------------------------------------------------------------------------

_INNER_ORACLE = f"""
SELECT
  c.c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {SUMD('o.o_totalprice')} AS total_revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_orderstatus = 'F'
GROUP BY c.c_mktsegment
"""


@register("join_inner_equi", _INNER_ORACLE)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join customer⋈orders with post-join aggregation; the
    o_orderstatus filter is pushed below the join into the scan."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# join_left_outer
# --------------------------------------------------------------------------

_LEFT_ORACLE = f"""
SELECT
  c.c_custkey,
  c.c_name,
  CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
  coalesce({SUMD('o.o_totalprice')}, 0.0) AS total_spent
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
"""


@register("join_left_outer", _LEFT_ORACLE)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (count 0, total 0)."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# join_semi / join_anti
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
)
GROUP BY c_mktsegment
"""


@register("join_semi", _SEMI_ORACLE)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: customers with >=1 big order.  This is the corrected
    form of the reference's ack membership check (`main.go:185-193`) —
    its `found` flag is never reset (reference bug); a semi-join is the
    intended per-item semantics."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_customers"))
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
"""


@register("join_anti", _ANTI_ORACLE)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti: customers with no orders at all (the nack side of R9)."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# join_cross_theta
# --------------------------------------------------------------------------

_THETA_ORACLE = """
SELECT
  s.s_suppkey,
  CAST(COUNT(*) AS BIGINT) AS n_parts_in_band,
  CAST(MIN(p.p_size) AS INTEGER) AS min_size,
  CAST(MAX(p.p_size) AS INTEGER) AS max_size
FROM supplier s
JOIN part p
  ON p.p_size BETWEEN (s.s_suppkey % 20) AND (s.s_suppkey % 20 + 10)
GROUP BY s.s_suppkey
"""


@register("join_cross_theta", _THETA_ORACLE)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join supplier×part on a p_size band.  Plans
    as BroadcastNestedLoopJoin with the small side broadcast; at 100 TB a
    range join like this should be rewritten to an equi-join on bucketized
    range keys (explode the band into discrete buckets) — see
    llm/similarity.py for that pattern applied to ANN."""
    tune(spark)
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part")
    lo = s.s_suppkey % 20
    cond = p.p_size.between(lo, lo + 10)
    return (
        F.broadcast(s).join(p, cond)
        .groupBy("s_suppkey")
        .agg(
            F.count("*").alias("n_parts_in_band"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
    )


# --------------------------------------------------------------------------
# join_multiway_star  (flagship)
# --------------------------------------------------------------------------

_STAR_ORACLE = f"""
SELECT
  r.r_name AS region,
  n.n_name AS nation,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems,
  {SUMD('l.l_extendedprice * (1 - l.l_discount)', 6, 18)} AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
  AND l.l_returnflag <> 'R'
GROUP BY r.r_name, n.n_name
"""


@register("join_multiway_star", _STAR_ORACLE)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way star join region⋈nation⋈customer⋈orders⋈lineitem
    with date-range + flag filters, grouped revenue rollup.

    Plan shape we want at any scale: broadcast region+nation (constant
    size), shuffle customer⋈orders⋈lineitem on their keys with both
    filters pushed to the scans; partial aggregation before the final
    shuffle (Catalyst does map-side combine for sum/count)."""
    tune(spark)
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") != "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(revenue, 6, 18).alias("revenue"),
        )
    )


_FULL_ORACLE = """
SELECT
  coalesce(a.k, b.k) AS k,
  a.n_f AS n_f,
  b.n_o AS n_o
FROM (SELECT l_returnflag || '/' || l_linestatus AS k, CAST(COUNT(*) AS BIGINT) AS n_f
      FROM lineitem GROUP BY 1) a
FULL OUTER JOIN (SELECT o_orderstatus || '/' || 'O' AS k, CAST(COUNT(*) AS BIGINT) AS n_o
      FROM orders GROUP BY 1) b
  ON a.k = b.k
"""


@register("join_full_outer", _FULL_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated keyspaces (flag/status vs
    status/'O') — rows surviving from either side with nulls opposite.
    Right outer is the mirrored plan; Catalyst normalizes both to the
    same FULL/RIGHT SortMergeJoin family."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    a = (
        li.groupBy(
            F.concat_ws("/", "l_returnflag", "l_linestatus").alias("k")
        ).agg(F.count("*").alias("n_f"))
    )
    b = (
        o.groupBy(F.concat_ws("/", "o_orderstatus", F.lit("O")).alias("k"))
        .agg(F.count("*").alias("n_o"))
    )
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
        .select(
            F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
            F.col("a.n_f").alias("n_f"),
            F.col("b.n_o").alias("n_o"),
        )
    )


# --------------------------------------------------------------------------
# join_right_outer  (explicit right form; §2B's left/right/full row)
# --------------------------------------------------------------------------

_RIGHT_ORACLE = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal < 0
"""


@register("join_right_outer", _RIGHT_ORACLE)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join spelled as such (not the mirrored left): every
    negative-balance customer survives, orderless ones with NULL order
    columns.  Catalyst canonicalizes to the same broadcast plan as the
    mirrored left join — certified here so the surface is explicit."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


# --------------------------------------------------------------------------
# join_runtime_prefilter  (manual runtime filter: dim keys -> fact scan)
# --------------------------------------------------------------------------

# Above this many distinct dim keys the IN-list is no longer a cheap
# plan literal; fall back to [min,max] bounds (still scan-pushable).
_PREFILTER_MAX_KEYS = 10_000

_PREFILTER_ORACLE = f"""
SELECT p.p_size,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       {SUMD('l.l_extendedprice')} AS total_price
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#11'
GROUP BY p.p_size
"""


@register("join_runtime_prefilter", _PREFILTER_ORACLE)
def join_runtime_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual runtime filtering: the filtered dimension's join keys are
    collected once (dim-sized, bounded) and replayed onto the fact scan
    as a static predicate BEFORE the exact join — the hand-rolled form
    of dynamic partition pruning / InjectRuntimeFilter, for engines or
    layouts where the automatic rewrite can't fire (see
    tests/test_runtime_filters.py: the small-file scan repair breaks the
    scan-adjacent pattern the injected BLOOM needs).

    Two regimes: up to _PREFILTER_MAX_KEYS (10k) distinct keys the
    predicate is the exact IN-list (parquet row groups whose
    dictionary/stats miss every key are skipped outright); beyond that,
    [min,max] bounds — far weaker on uncorrelated keys, decisive when
    the key correlates with the dim predicate (time-ordered ingest).
    Either way the following broadcast equi-join keeps exact semantics,
    so the oracle is the PLAIN join: the prefilter must be
    result-invisible.

    Scale: the collect is LIMITed to _PREFILTER_MAX_KEYS + 1 rows, so
    it is driver-safe at any dim cardinality — the limit overflowing is
    itself the signal to take the bounds branch, whose min/max comes
    from a one-row aggregate, never a full collect.  The filtered dim
    is slot-cached so the key probe and the broadcast join share one
    scan.  The fact table never shuffles — filtered scan into a
    broadcast join, partial agg, one exchange on the 50-value group key.
    """
    from go_pulsar_elasticsearch_spark.functions.caching import (
        cache_slot,
        checkpoint_slot,
    )

    tune(spark)
    p = checkpoint_slot(
        "runtime_prefilter_dim",
        t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11"),
    )
    keys = [
        r[0]
        for r in p.select("p_partkey")
        .distinct()
        .limit(_PREFILTER_MAX_KEYS + 1)
        .collect()
    ]
    li = t(spark, sf_dir, "lineitem")
    if not keys:
        li = li.filter(F.lit(False))
    elif len(keys) <= _PREFILTER_MAX_KEYS:
        li = li.filter(F.col("l_partkey").isin(keys))
    else:
        lo_hi = p.agg(
            F.min("p_partkey").alias("lo"), F.max("p_partkey").alias("hi")
        ).first()
        li = li.filter(F.col("l_partkey").between(lo_hi[0], lo_hi[1]))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_size")
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum("l_extendedprice").alias("total_price"),
        )
    )
