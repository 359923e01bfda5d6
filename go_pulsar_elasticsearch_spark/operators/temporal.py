"""Temporal versioning: slowly-changing-dimension (type 2) history from
a change feed.

The reference's sink is last-write-wins by uuid (es.go:186) — history is
destroyed on every update.  scd2_history is the warehouse-grade
alternative: every change becomes a validity interval
[valid_from, valid_to), the current version is flagged, and point-in-
time queries become a range predicate.  This is the canonical
"dimension table from a CDC stream" operator.

100 TB posture: one window shuffle on the business key; the lead()
computing valid_to shares the exchange+sort with version_n (same
partitionBy/orderBy), so Catalyst plans a single Window node.  In
production the same transform runs inside foreachBatch over the CDC
stream with the previous snapshot unioned in — identical plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_SCD2_ORACLE = """
SELECT
  o_custkey,
  o_orderkey AS change_id,
  o_totalprice AS tracked_value,
  o_orderdate AS valid_from,
  LEAD(o_orderdate) OVER w AS valid_to,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_n,
  LEAD(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("scd2_history", _SCD2_ORACLE)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders as a change feed per customer -> type-2 history: validity
    interval, version number, current flag.  valid_to, version_n and
    is_current all ride ONE window (same partition/order), so the op
    costs a single shuffle on the business key; ties broken by the
    change id for determinism."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderkey").alias("change_id"),
        F.col("o_totalprice").alias("tracked_value"),
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version_n"),
        valid_to.isNull().alias("is_current"),
    )
