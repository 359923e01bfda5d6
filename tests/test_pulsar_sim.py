"""Pulsar-shaped Python Data Source: batch partitioned read, streaming
offset ranges, and the reference-shaped record properties (duplicate
uuids, nullable tags) flowing through the real source API."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.sources.pulsar_sim import register


def test_batch_read_is_partitioned_and_deterministic(spark):
    register(spark)
    df = (
        spark.read.format("pulsar_sim")
        .option("numRows", 200)
        .option("numPartitions", 4)
        .load()
    )
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4
    # deterministic: same options -> identical content
    again = (
        spark.read.format("pulsar_sim").option("numRows", 200)
        .option("numPartitions", 4).load()
    )
    assert df.exceptAll(again).count() == 0
    # reference-shaped: duplicate uuids exist (last-write-wins fodder)...
    assert df.groupBy("uuid").count().filter("count > 1").count() > 0
    # ...and some null tags (the Avro union default)
    assert df.filter(F.col("tags").isNull()).count() > 0
    assert df.filter(F.col("tags").isNotNull()).count() > 0


def test_stream_reads_in_offset_batches(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("pulsar_sim")
        .option("rowsPerBatch", 50)
        .option("maxRows", 120)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pulsar_sim_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # drain until the offset stops advancing at maxRows
    q.processAllAvailable()
    q.stop()
    out = spark.table("pulsar_sim_out")
    assert out.count() == 120
    # every record exactly once across micro-batches
    assert out.select("identifier").distinct().count() == 120


def test_stream_feeds_ingest_pipeline(spark, tmp_path):
    """End-to-end: the simulated source drives the reference pipeline
    (derive R5 -> upsert-ready uuid keying) through foreachBatch."""
    from go_pulsar_elasticsearch_spark.ingest.pipeline import derive_ingest_cols

    register(spark)
    stream = (
        spark.readStream.format("pulsar_sim")
        .option("rowsPerBatch", 60)
        .option("maxRows", 60)
        .load()
        .withColumnRenamed("ingestion_time", "ingestion_ms")
    )
    derived = derive_ingest_cols(stream, ms_col="ingestion_ms")
    q = (
        derived.writeStream.format("memory")
        .queryName("pulsar_sim_derived")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("pulsar_sim_derived")
    assert out.count() == 60
    assert "ingestion_time" in out.columns and "ingest_date" in out.columns
