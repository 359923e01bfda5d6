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
