"""The reference's ingest pipeline (SURVEY.md §2A, R3–R11) as Spark
transforms.

Reference data path (`main.go:131-202`): Avro decode -> project/derive
(`model.go:28-44` ToIndex) -> micro-batch -> ES bulk upsert keyed on uuid
(`es.go:186`) -> ack/nack + DLQ.  Here each step is a pure DataFrame
transform, batch-certified against DuckDB; streaming/stream.py wraps the
same transforms in Structured Streaming (trigger ≡ gobatch R6, checkpoint
≡ ack/nack R9).

Every transform is narrow (no shuffle) except the upsert, which shuffles
once on the key — exactly the minimum required by last-write-wins
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# Core transforms (reusable by batch + streaming paths)
# --------------------------------------------------------------------------


def derive_ingest_cols(df: DataFrame, ms_col: str = "ingestion_ms") -> DataFrame:
    """R5 (`model.go:28-44`): epoch-millis -> timestamp, add processing-time
    persist_time and the daily partition column the dated sink (R11) keys
    on (`es.go:79-81` builds `<alias>_YYYY-MM-DD`)."""
    return (
        df.withColumn("ingestion_time", F.timestamp_millis(F.col(ms_col)))
        .withColumn("persist_time", F.current_timestamp())
        .withColumn("ingest_date", F.to_date("ingestion_time"))
    )


def upsert_last_write_wins(df: DataFrame, key_cols: list[str], ts_col: str,
                           tiebreak: str) -> DataFrame:
    """R8 (`es.go:186`): deterministic doc-id upsert == keep only the last
    write per key.  One shuffle on the key; rank-1 filter is map-side after
    the sort within partitions."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col), F.desc(tiebreak))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dlq_split(df: DataFrame, valid: Column) -> tuple[DataFrame, DataFrame]:
    """R4/R9 (`main.go:131-143`): route records failing validation to a DLQ
    branch instead of poisoning the main flow.  Two filters over one scan;
    Spark reuses the exchange under AQE."""
    return df.filter(valid), df.filter(~valid | valid.isNull())


def write_dated_partitions(df: DataFrame, path: str, date_col: str = "ingest_date",
                           fmt: str = "parquet") -> None:
    """R11 (`es.go:78-116`): daily index `<alias>_YYYY-MM-DD` behind a
    stable alias == a date-partitioned table behind a stable name.
    Partition pruning on date_col is the alias-routing equivalent."""
    df.write.mode("append").partitionBy(date_col).format(fmt).save(path)


def refresh_daily_alias(spark: SparkSession, path: str, alias: str,
                        date_col: str = "ingest_date") -> str:
    """R11's alias flip (`es.go:102-116`): the reference points a stable
    alias at the NEWEST dated index on startup/rollover, while older
    indices stay reachable by their dated names.  Local equivalent: a
    temp view `alias` over only the latest date partition (full history
    stays queryable through the table path).  Returns the date the alias
    now points at.  The view's equality predicate is a partition filter,
    so reading the alias scans exactly one day's files — same routing
    cost as ES resolving the alias to one index."""
    part = spark.read.parquet(path)
    latest = part.select(F.max(date_col).alias("d")).collect()[0]["d"]
    part.filter(F.col(date_col) == F.lit(latest)).createOrReplaceTempView(alias)
    return str(latest)


# --------------------------------------------------------------------------
# Certified queries (events.parquet stands in for the Pulsar stream)
# --------------------------------------------------------------------------

_DERIVE_ORACLE = """
SELECT
  event_id,
  CAST(epoch_ms(ts) AS BIGINT) AS ingestion_ms,
  make_timestamp(CAST(epoch_ms(ts) AS BIGINT) * 1000) AS ingestion_time,
  CAST(CAST(ts AS DATE) AS TIMESTAMP) AS ingest_date
FROM events
"""


@register("derive_ingest_columns", _DERIVE_ORACLE)
def derive_ingest_columns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic core of R5: millis->timestamp round-trip + partition
    date.  persist_time (current_timestamp) is nondeterministic by design
    and certified separately in tests/test_ingest.py."""
    tune(spark)
    ev = t(spark, sf_dir, "events").withColumn("ingestion_ms", F.unix_millis("ts"))
    out = derive_ingest_cols(ev)
    return out.select(
        "event_id", "ingestion_ms", "ingestion_time",
        F.col("ingest_date").cast("timestamp").alias("ingest_date"),
    )


_UPSERT_ORACLE = """
SELECT user_id, event_type, event_id, value, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
"""


@register("idempotent_upsert_by_key", _UPSERT_ORACLE)
def idempotent_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 last-write-wins on (user_id, event_type) — the batch form of the
    ES doc-id upsert that makes replays idempotent."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    deduped = upsert_last_write_wins(ev, ["user_id", "event_type"], "ts", "event_id")
    return deduped.select(
        "user_id", "event_type", "event_id", "value",
        F.unix_millis("ts").alias("ts_ms"),
    )


_DLQ_ORACLE = """
SELECT branch, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
FROM (
  SELECT CASE
    WHEN json_extract_string(props, '$.k') IS NOT NULL AND value >= 1.0
    THEN 'main' ELSE 'dlq'
  END AS branch, event_id
  FROM events
)
GROUP BY branch
"""


@register("dlq_split", _DLQ_ORACLE)
def dlq_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4/R9 two-branch routing; certified via per-branch count + id-sum
    (proves the split is a partition of the input, nothing dropped)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    valid = F.get_json_object("props", "$.k").isNotNull() & (F.col("value") >= 1.0)
    main_df, dlq_df = dlq_split(ev, valid)

    def branch_stats(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n"), F.sum("event_id").alias("id_sum")
        ).select(F.lit(label).alias("branch"), "n", "id_sum")

    return branch_stats(main_df, "main").unionByName(branch_stats(dlq_df, "dlq"))


_DATED_ORACLE = """
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS ingest_date, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
GROUP BY 1
"""


@register("dated_partition_sink", _DATED_ORACLE)
def dated_partition_sink_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11 partition layout: per-day row counts == the daily `alias_DATE`
    indices the reference creates.  The physical partitionBy write is
    exercised in tests/test_ingest.py (can't write inside a read-only
    certification query)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("ingest_date", F.date_trunc("day", "ts"))
        .groupBy("ingest_date")
        .agg(F.count("*").alias("n_rows"))
    )
