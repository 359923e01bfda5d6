"""Shared store-bootstrap contract for the foreachBatch monitors.

Every incremental monitor (near_dedup, lm_monitor, cms_monitor) keeps
its accumulating state as epoch-keyed parquet directories and must read
"the store so far" before the first epoch exists.  The contract lives
here once: a missing store reads as an EMPTY frame of the declared
schema (AnalysisException is the missing-path signal in PySpark), so
epoch 0 behaves identically to every later epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def read_store_or_empty(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)
