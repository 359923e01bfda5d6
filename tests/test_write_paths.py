"""Write-path posture for a continuously-reingested 100 TB corpus:

- dynamic partition overwrite: re-running one day's pipeline replaces
  ONLY that day's partition (the Spark equivalent of the reference's
  daily index rollover behind an alias, `es.go:78-116`, where a re-run
  re-creates just the dated index);
- schema evolution on read (mergeSchema): adding a column to new
  partitions must not break scans over old + new together.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="gpe_write_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _daily(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.withColumn("day", F.to_date(F.date_trunc("day", F.col("ts"))))


def test_dynamic_partition_overwrite_replaces_one_day(spark, sf_dir, tmpdir):
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        daily = _daily(spark, sf_dir)
        days = [r["day"] for r in daily.select("day").distinct().limit(2).collect()]
        assert len(days) == 2
        d0, d1 = sorted(days)

        daily.filter(F.col("day").isin([d0, d1])).write.partitionBy(
            "day"
        ).mode("overwrite").parquet(tmpdir)
        before = spark.read.parquet(tmpdir)
        n_d0 = before.filter(F.col("day") == d0).count()
        n_d1 = before.filter(F.col("day") == d1).count()
        assert n_d0 > 0 and n_d1 > 0

        # "re-run" day d1's pipeline with half the rows; dynamic mode must
        # leave d0 untouched and replace d1 wholesale
        rerun = (
            daily.filter(F.col("day") == d1)
            .filter(F.col("event_id") % 2 == 0)
        )
        n_rerun = rerun.count()
        rerun.write.partitionBy("day").mode("overwrite").parquet(tmpdir)

        after = spark.read.parquet(tmpdir)
        assert after.filter(F.col("day") == d0).count() == n_d0
        assert after.filter(F.col("day") == d1).count() == n_rerun
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")


def test_merge_schema_reads_old_and_new_partitions(spark, sf_dir, tmpdir):
    daily = _daily(spark, sf_dir)
    days = [r["day"] for r in daily.select("day").distinct().limit(2).collect()]
    d0, d1 = sorted(days)

    daily.filter(F.col("day") == d0).write.partitionBy("day").mode(
        "append"
    ).parquet(tmpdir)
    # new pipeline version adds a column
    daily.filter(F.col("day") == d1).withColumn(
        "quality", F.lit(0.5)
    ).write.partitionBy("day").mode("append").parquet(tmpdir)

    merged = spark.read.option("mergeSchema", "true").parquet(tmpdir)
    assert "quality" in merged.columns
    old = merged.filter(F.col("day") == d0)
    new = merged.filter(F.col("day") == d1)
    # old partition surfaces the new column as NULL; new one carries it
    assert old.filter(F.col("quality").isNull()).count() == old.count()
    assert new.filter(F.col("quality") == 0.5).count() == new.count()
    assert merged.count() == old.count() + new.count()


def test_daily_alias_flips_to_newest_partition(spark, tmp_path):
    """R11: after each day's write the alias resolves to ONLY the newest
    dated partition; history stays reachable through the table path."""
    from go_pulsar_elasticsearch_spark.ingest.pipeline import (
        refresh_daily_alias,
        write_dated_partitions,
    )

    path = str(tmp_path / "dated")
    day1 = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-01")], "id long, ingest_date string"
    )
    write_dated_partitions(day1, path)
    assert refresh_daily_alias(spark, path, "idx_alias") == "2024-01-01"
    assert spark.table("idx_alias").count() == 2

    day2 = spark.createDataFrame(
        [(3, "2024-01-02")], "id long, ingest_date string"
    )
    write_dated_partitions(day2, path)
    assert refresh_daily_alias(spark, path, "idx_alias") == "2024-01-02"
    # alias = newest day only; table path = full history
    assert spark.table("idx_alias").count() == 1
    assert {r["id"] for r in spark.table("idx_alias").collect()} == {3}
    assert spark.read.parquet(path).count() == 3
    # the alias read prunes to one partition
    plan = spark.table("idx_alias")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_sharded_training_export_bounds_file_sizes(spark, sf_dir, tmp_path):
    """Training-data export: shard the corpus into bounded files
    (maxRecordsPerFile) so downstream loaders stream fixed-size shards —
    no shard may exceed the record cap and nothing may be lost."""
    import glob

    from go_pulsar_elasticsearch_spark.catalog import t as load_t

    docs = load_t(spark, sf_dir, "documents")
    total = docs.count()
    out = str(tmp_path / "shards")
    (
        docs.repartition(4)
        .write.option("maxRecordsPerFile", 100)
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == total
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) >= 4
    for f in files:
        assert spark.read.parquet(f).count() <= 100
