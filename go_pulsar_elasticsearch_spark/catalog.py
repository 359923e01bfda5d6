"""Catalog: load the driver's parquet fixture tables as DataFrames.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

Reads are plain ``spark.read.parquet`` so Catalyst gets native parquet
scans with predicate pushdown + column pruning; at 100 TB these would be
directory-partitioned datasets and the same call sites pick up partition
pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    events.parquet has shipped `ts` as TIMESTAMP(NANOS) (rejected by the
    parquet reader — read nanos as long and truncate) and as plain
    TIMESTAMP(MICROS) without a timezone (read as TIMESTAMP_NTZ under
    Spark 4's NTZ inference).  Normalize every variant to a session-UTC
    TIMESTAMP so downstream operators (`unix_millis`, `window`, …) see
    one type; the session timeZone is pinned to UTC, so the NTZ→LTZ cast
    is instant-preserving and matches DuckDB's naive-timestamp epoch_ms.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ->LTZ cast below is instant-preserving ONLY under a UTC
        # session; pin it here rather than trusting the caller to have gone
        # through session.get_spark()/tune().
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
