"""Source-format breadth: the engine's readers are format-agnostic —
CSV and JSON copies of a fixture table round-trip to the same rows as
the parquet original under an explicit schema (schema-on-read, never
inference, matching the reference's declared-schema posture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _canon(df):
    return df.select(
        "event_id", "user_id", "event_type",
        F.unix_millis("ts").alias("ts_ms"),
        F.round("value", 2).alias("value"),
    ).orderBy("event_id")


def test_csv_and_json_roundtrip_match_parquet(spark, sf_dir, tmp_path):
    ev = t(spark, sf_dir, "events")
    csv_path = str(tmp_path / "events_csv")
    json_path = str(tmp_path / "events_json")
    (
        ev.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .write.option("header", True).mode("overwrite").csv(csv_path)
    )
    ev.write.mode("overwrite").json(json_path)

    csv_df = (
        spark.read.schema(_SCHEMA)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(csv_path)
    )
    json_df = spark.read.schema(_SCHEMA).json(json_path)

    base = _canon(ev).collect()
    assert _canon(csv_df).collect() == base
    assert _canon(json_df).collect() == base
