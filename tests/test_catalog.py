"""Scan-parallelism repair: fires only on degenerate single-file
layouts, never on production-shaped multi-file datasets, and the plan
audit separates its exchange from algorithmic shuffles."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import (
    _FACT_KEYS,
    _OPEN_COST_BYTES,
    _repair_scan_parallelism,
    t,
)
from go_pulsar_elasticsearch_spark.plans.inspect import (
    exchange_count,
    formatted_plan,
    layout_repair_exchange_ids,
)

from tests.conftest import SF_DIR


def _has_repartition(df) -> bool:
    return "REPARTITION_BY_NUM" in formatted_plan(df)


def test_repair_fires_on_single_file_fixture(spark):
    docs = t(spark, SF_DIR, "documents")
    assert _has_repartition(docs)
    assert docs.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_repair_is_noop_on_multi_split_layout(spark, tmp_path):
    """A dataset whose own layout feeds the cores (many files — the
    production shape) must NOT be repartitioned: the gate estimates the
    file's split count from its size and stands down when the scan can
    parallelize by itself."""
    src = t(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "many")
    src.repartition(8).write.parquet(path)
    assert len([f for f in os.listdir(path) if f.endswith(".parquet")]) >= 8
    df = spark.read.parquet(path)
    # 8 part files feed this 8-core test session -> repair declines
    repaired = _repair_scan_parallelism(spark, df, path, "doc_id")
    assert not _has_repartition(repaired)
    # a hypothetical large single file also declines by the size gate:
    # est_splits = size // open_cost must reach half the cores
    big = _OPEN_COST_BYTES * spark.sparkContext.defaultParallelism
    one = str(tmp_path / "one.parquet")
    with open(one, "wb") as f:
        f.write(b"\0" * 16)  # size checked via getsize, content unread
    os.truncate(one, big)
    repaired2 = _repair_scan_parallelism(spark, df, one, "doc_id")
    assert not _has_repartition(repaired2)


def test_plan_audit_separates_repair_from_algorithmic_shuffles(spark):
    docs = t(spark, SF_DIR, "documents")
    narrow = docs.select("doc_id", F.length("text").alias("n"))
    plan = formatted_plan(narrow)
    assert len(layout_repair_exchange_ids(plan)) == 1
    assert exchange_count(narrow) == 0
    assert exchange_count(narrow, include_layout_repair=True) > 0
    # an algorithmic shuffle still counts
    agg = docs.groupBy("lang").count()
    assert exchange_count(agg) > 0


def test_fact_keys_exist_in_schemas(spark):
    for name, key in _FACT_KEYS.items():
        assert key in t(spark, SF_DIR, name).columns, (name, key)
