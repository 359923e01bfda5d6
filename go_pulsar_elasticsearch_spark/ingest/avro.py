"""Avro decode (reference R3: `parseMsg`, main.go:145-158).

The reference decodes Pulsar Avro payloads against the IngestionData
schema (schema/pulsar/avro/index_topic.avro).  Spark's equivalent is
``from_avro(value, schema_json)`` from the spark-avro module — an
external datasource package that is NOT bundled in this container's
pyspark, so the adapter gates cleanly and the streaming tests exercise
the identical downstream pipeline through the JSON decode stand-in
(streaming/stream.py:decode_json_payload).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# IngestionData, transcribed from the reference's Avro schema
# (/root/reference/schema/pulsar/avro/index_topic.avro:1-52).
INGESTION_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "IngestionData",
        "fields": [
            {"name": "identifier", "type": "string"},
            {"name": "name", "type": "string"},
            {"name": "uuid", "type": "string"},
            {"name": "type", "type": "string"},
            {"name": "ingestion_time", "type": "long"},
            {
                "name": "tags",
                "type": [
                    "null",
                    {
                        "type": "array",
                        "items": {
                            "type": "record",
                            "name": "Tag",
                            "fields": [
                                {"name": "type", "type": "string"},
                                {"name": "value", "type": "string"},
                            ],
                        },
                    },
                ],
                "default": None,
            },
        ],
    }
)


def avro_available(spark=None) -> bool:
    """True only if the spark-avro JVM datasource is actually loaded (the
    Python wrapper always imports; the failure surfaces at analysis)."""
    try:
        from pyspark.sql import functions as F  # noqa: F811
        from pyspark.sql.avro.functions import to_avro

        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                return False
        probe = spark.range(1).select(to_avro(F.struct(F.col("id"))))
        probe.schema  # forces analysis
        return True
    except Exception:
        return False


def decode_avro_payload(raw: DataFrame, value_col: str = "value",
                        schema_json: str = INGESTION_AVRO_SCHEMA) -> DataFrame:
    """R3: binary Avro -> typed columns, PERMISSIVE (undecodable rows get
    a null struct and flow to the DLQ split, matching main.go:131-143).

    Raises RuntimeError with remediation when spark-avro isn't loaded."""
    try:
        from pyspark.sql.avro.functions import from_avro

        parsed = raw.withColumn(
            "parsed",
            from_avro(F.col(value_col), schema_json, {"mode": "PERMISSIVE"}),
        )
        parsed.schema  # force analysis so a missing datasource fails HERE
    except Exception as exc:
        raise RuntimeError(
            "spark-avro module not available; start the session with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
            "(local tests use the JSON decode stand-in, which exercises "
            "the same downstream pipeline)"
        ) from exc
    parsed = parsed.withColumn(
        "parsed", F.when(F.col("parsed.uuid").isNotNull(), F.col("parsed"))
    )
    return parsed.select(
        F.col(value_col).alias("raw_value"), "parsed", "parsed.*"
    )
