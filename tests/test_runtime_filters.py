"""Runtime bloom-filter join reduction (SPARK-32268): with a selective
filter on the creation side, Spark injects might_contain() onto the
application side's scan, cutting the big side's shuffle volume before
the join — the other half of the runtime-filter story next to DPP
(test_dpp.py).

Fixture caveat discovered here: the scan-parallelism repair
(catalog._repair_scan_parallelism) inserts a repartition between the
parquet scan and the join, which breaks InjectRuntimeFilter's
scan-adjacent pattern — so these tests drive PLAIN spark.read scans.
At production layouts (many files/row groups) the repair is inert by
its own gate and bloom injection applies to the same call sites.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@pytest.fixture()
def bloom_confs(spark):
    saved = {}
    for k, v in _CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )


def test_bloom_filter_is_injected(spark, sf_dir, bloom_confs):
    j = _join(spark, sf_dir)
    opt = j._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "might_contain" in opt, opt[:2000]


def test_bloom_filter_preserves_results(spark, sf_dir, bloom_confs):
    with_bloom = _join(spark, sf_dir).groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,1)")).alias("sq"),
    ).first()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = _join(spark, sf_dir).groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,1)")).alias("sq"),
    ).first()
    assert with_bloom == without
    assert with_bloom["n"] > 0
