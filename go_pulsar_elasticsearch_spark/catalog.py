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

    events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    rejects; read nanos as long (runtime conf) and truncate to microsecond
    timestamps — integer DIV, not float division, so no rounding.  DuckDB
    reads the same column as µs-truncated TIMESTAMP, so both engines see
    identical values.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
