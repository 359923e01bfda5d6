"""Bucketed-table co-located joins — the 100 TB lever the docstrings
keep promising ("at scale the base side is a pre-materialized
bucketed-by-hash table").  This proves the claim mechanically: two
tables bucketed on the join key by the same bucket count join with NO
shuffle exchange in the physical plan.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.plans.inspect import formatted_plan


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    """Write orders and customer bucketed by custkey into a scratch
    warehouse-backed catalog namespace; drop everything afterwards."""
    tmp = tempfile.mkdtemp(prefix="gpe_buckets_")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    (
        orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").option("path", f"{tmp}/orders_b")
        .saveAsTable("orders_bucketed")
    )
    (
        customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").option("path", f"{tmp}/customer_b")
        .saveAsTable("customer_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    # Disable auto-broadcast so the join would otherwise shuffle both
    # sides; bucketing must make it exchange-free instead.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("orders_bucketed")
            .join(
                spark.table("customer_bucketed"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        plan = formatted_plan(joined)
        # the join itself must not introduce a shuffle: the only allowed
        # exchange is the one for the post-join groupBy
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, join_section
        n = joined.count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_unbucketed(spark, warehouse, sf_dir):
    bucketed = (
        spark.table("orders_bucketed")
        .join(
            spark.table("customer_bucketed"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
