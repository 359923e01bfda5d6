"""Set operators: UNION / INTERSECT / EXCEPT (SURVEY.md §2B).

UNION ALL is a free concatenation (no shuffle); INTERSECT/EXCEPT plan as
shuffles on the full row — at scale prefer keyed semi/anti joins when a
key exists (see operators/joins.py), which shuffle narrower rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_SETOPS_ORACLE = """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
SELECT 'union' AS op, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM rich)
UNION ALL
SELECT 'union_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT c_custkey FROM building UNION ALL SELECT c_custkey FROM rich)
UNION ALL
SELECT 'intersect' AS op, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
UNION ALL
SELECT 'except' AS op, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
"""


@register("set_ops", _SETOPS_ORACLE)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union/unionAll/intersect/except over two customer segments, reduced
    to deterministic counts (one row per operator)."""
    tune(spark)
    c = t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")

    def cnt(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("n")).select(
            F.lit(label).alias("op"), "n"
        )

    return (
        cnt(building.union(rich).distinct(), "union")
        .unionByName(cnt(building.union(rich), "union_all"))
        .unionByName(cnt(building.intersect(rich), "intersect"))
        .unionByName(cnt(building.subtract(rich), "except"))
    )
