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


# ---------------------------------------------------------------- ES strict


def test_strict_mapping_accepts_declared_schema(spark):
    """Columns ⊆ mapping with matching types pass, come back in mapping
    order, and missing fields (persist_time) are fine — ES docs are
    sparse."""
    from go_pulsar_elasticsearch_spark.sources.es_sink import (
        enforce_strict_mapping,
    )

    df = spark.createDataFrame(
        [("u-1", "m", "id1", "n1")], "uuid string, type string, "
        "identifier string, name string"
    ).withColumn("ingestion_time", F.current_timestamp()).withColumn(
        "tags",
        F.array(F.struct(F.lit("a").alias("type"), F.lit("b").alias("value"))),
    )
    out = enforce_strict_mapping(df)
    assert out.columns == [
        "type", "identifier", "name", "ingestion_time", "uuid", "tags"
    ]
    assert out.count() == 1


def test_strict_mapping_rejects_unknown_and_mistyped(spark):
    """dynamic: strict (mapping.json:11): unknown fields and type
    conflicts fail the batch loudly, naming the offenders."""
    import pytest

    from go_pulsar_elasticsearch_spark.sources.es_sink import (
        StrictMappingViolation,
        enforce_strict_mapping,
    )

    unknown = spark.createDataFrame(
        [("u", "x")], "uuid string, rogue_field string"
    )
    with pytest.raises(StrictMappingViolation, match="rogue_field"):
        enforce_strict_mapping(unknown)
    mistyped = spark.createDataFrame(
        [("u", 5)], "uuid string, ingestion_time long"
    )
    with pytest.raises(StrictMappingViolation, match="ingestion_time"):
        enforce_strict_mapping(mistyped)


def test_strict_mapping_wired_into_foreachbatch(spark, tmp_path):
    """The enforcement runs inside a real foreachBatch epoch: a valid
    stream lands, a drifted stream fails the query with the violation."""
    import pytest

    from go_pulsar_elasticsearch_spark.sources.es_sink import (
        enforce_strict_mapping,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [("u-1", "t1"), ("u-2", "t2")], "uuid string, type string"
    ).write.mode("append").parquet(src)

    def body(batch_df, epoch_id):
        enforce_strict_mapping(batch_df).write.mode("append").parquet(out)

    q = (
        spark.readStream.schema("uuid string, type string").parquet(src)
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 2

    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [("u-3", "oops")], "uuid string, rogue string"
    ).write.mode("append").parquet(src2)
    q2 = (
        spark.readStream.schema("uuid string, rogue string").parquet(src2)
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="rogue"):
        q2.awaitTermination()
