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

# Fact tables whose scans get parallelism repair (below), each with its
# natural key for deterministic hash redistribution; dimension tables
# stay as-is — they broadcast, and 32 near-empty tasks per dim per
# query is pure scheduling overhead.
_FACT_KEYS = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    # user_id, not event_id: every events operator windows/groups/joins
    # by user (sessionize, funnels, retention, as-of/interval joins), so
    # hashing the repair on the workload key co-partitions the whole
    # family — the same implicit-bucketing effect the orderkey gives
    # orders⋈lineitem.  1500 uniform users at sf0.1: no skew exposure.
    "events": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_FACT_TABLES = frozenset(_FACT_KEYS)

# Spark's split math: maxSplitBytes = min(maxPartitionBytes,
# max(openCostInBytes, totalBytes/defaultParallelism)) — for files below
# ~openCost*cores this floors at openCostInBytes (4 MB), and a
# single-row-group file yields ONE effective split regardless.  The
# fixture tables are exactly that shape (one file, one row group), so
# every narrow chain over them — shingle/md5 signature builds, regex
# gates, simhash bit folds — ran on ONE core of local[32] until the
# first shuffle.  measured: the minhash band-sig build over sf0.1
# documents dropped 1.35s -> 0.43s once the scan was spread.
_OPEN_COST_BYTES = 4 * 1024 * 1024


def _repair_scan_parallelism(
    spark: SparkSession, df: DataFrame, path: str, key: str
) -> DataFrame:
    """Hash-repartition a fact scan the file layout under-splits.

    Production posture: a 100 TB dataset arrives as thousands of files
    (or single files with many row groups) and this is a no-op by the
    size gate; a pathologically-under-partitioned source (one giant
    file / single row group — the parquet analog of one big gzip) is
    exactly the case where redistributing once up front is correct,
    because EVERY downstream narrow transform inherits the dead scan's
    parallelism otherwise.  Hash on the table's unique natural key (not
    round-robin): per-row deterministic with no skew exposure, and it
    avoids round-robin's sortBeforeRepartition, which fully sorts each
    input partition on one core first — measured as a ~0.3-0.5s tax on
    every cheap query over the 600k-row single-partition lineitem.

    Known trade (tests/test_runtime_filters.py): the injected
    repartition sits between the scan and any join, which breaks
    InjectRuntimeFilter's scan-adjacent pattern — runtime BLOOM filters
    are not injected over repaired scans.  Acceptable here because the
    repair only fires on layouts so small that a bloom filter saves
    nothing; at production layouts the size gate keeps the scan bare
    and bloom injection applies."""
    try:
        cores = spark.sparkContext.defaultParallelism
        if os.path.isdir(path):
            # directory dataset: every part file is at least one split
            sizes = [
                e.stat().st_size
                for e in os.scandir(path)
                if e.is_file() and e.name.endswith(".parquet")
            ]
        else:
            sizes = [os.path.getsize(path)]
    except OSError:
        return df
    est_splits = sum(max(1, s // _OPEN_COST_BYTES) for s in sizes)
    if est_splits * 2 < cores:
        return df.repartition(cores, F.col(key))
    return df


def t(
    spark: SparkSession, sf_dir: str, name: str, repair: bool = True
) -> DataFrame:
    """Load one fixture table.

    ``repair=False`` skips the scan-parallelism repair for operators
    whose FIRST step is a row-shrinking projection followed by their own
    shuffle (e.g. exact_dedup: sha2(text) then groupBy) — there the
    repair's full-width repartition moves the text column for nothing,
    because the operator's own shuffle redistributes the (already
    narrow) rows one step later anyway.

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
        if not repair:
            return df
        return _repair_scan_parallelism(
            spark, df, os.path.join(sf_dir, "events.parquet"),
            _FACT_KEYS["events"],
        )
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if repair and name in _FACT_TABLES:
        df = _repair_scan_parallelism(spark, df, path, _FACT_KEYS[name])
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
