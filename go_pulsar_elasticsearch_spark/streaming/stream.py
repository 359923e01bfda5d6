"""Structured Streaming form of the reference's pipeline (SURVEY.md §3.2).

Reference chain (`main.go:131-202`):
  Pulsar consume -> Avro decode -> project/derive -> count/time micro-batch
  -> ES bulk upsert by uuid -> ack/nack -> DLQ.

Spark chain (this module):
  readStream (file/rate locally, Pulsar connector in prod)
  -> decode (from_json / from_avro)            [R3]
  -> derive_ingest_cols                        [R5]
  -> withWatermark + dropDuplicates(key)       [R8, stateful form]
  -> trigger(processingTime|availableNow)      [R6 ≡ gobatch]
  -> foreachBatch: DLQ split + dated-partition upsert sink  [R4, R9, R11]

Checkpointing replaces the ack/nack loop: a failed batch replays whole,
and the key-addressed sink makes the replay idempotent — the corrected
semantics of the reference's buggy `found` flag (`main.go:184`, never
reset; see SURVEY.md R9).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from go_pulsar_elasticsearch_spark.ingest.pipeline import (
    derive_ingest_cols,
    dlq_split,
    upsert_last_write_wins,
)

# The reference's Avro record IngestionData
# (/root/reference/schema/pulsar/avro/index_topic.avro:1-52): the union
# ["null", array<Tag>] maps to a nullable ArrayType — no map wrapper
# (the Go binding's Tags["array"] dance, model.go:40, disappears).
INGESTION_SCHEMA = StructType(
    [
        StructField("identifier", StringType()),
        StructField("name", StringType()),
        StructField("uuid", StringType()),
        StructField("type", StringType()),
        StructField("ingestion_time", LongType()),  # epoch millis
        StructField(
            "tags",
            ArrayType(
                StructType(
                    [StructField("type", StringType()), StructField("value", StringType())]
                ),
                containsNull=False,
            ),
            nullable=True,
        ),
    ]
)


def decode_json_payload(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """R3/R4: permissive decode of a JSON payload into IngestionData;
    undecodable rows keep a NULL struct and flow to the DLQ branch
    (reference logs+drops at main.go:131-143, then DLQ via nack)."""
    parsed = raw.withColumn(
        "parsed", F.from_json(F.col(value_col).cast("string"), INGESTION_SCHEMA)
    )
    # PERMISSIVE from_json yields an all-null struct for garbage, not NULL;
    # a record without the uuid doc-id (es.go:186) is unindexable either
    # way, so normalize both cases to parsed IS NULL -> DLQ branch.
    parsed = parsed.withColumn(
        "parsed",
        F.when(F.col("parsed.uuid").isNotNull(), F.col("parsed")),
    )
    return parsed.select(
        F.col(value_col).cast("string").alias("raw_value"), "parsed", "parsed.*"
    )


def file_stream(spark: SparkSession, path: str, schema: StructType,
                fmt: str = "parquet", max_files: int = 1) -> DataFrame:
    """Local stand-in for the Pulsar source: directory stream with rate
    limiting (maxFilesPerTrigger ≡ receiver queue bounds, .env:7)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files))
        .load(path)
    )


@dataclass
class StreamMetrics:
    """The reference's 5 Prometheus counters (pkg/metrics/metrics.go:9-41)
    accumulated from foreachBatch — error, index-error, dlq, received,
    indexed."""

    received: int = 0
    indexed: int = 0
    dlq: int = 0
    errors: int = 0
    index_errors: int = 0
    batches: list = field(default_factory=list)


def run_ingest_pipeline(
    spark: SparkSession,
    source: DataFrame,
    sink_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
    ts_col: str = "ingestion_time",
    tiebreak: str = "identifier",
    metrics: StreamMetrics | None = None,
    available_now: bool = True,
    processing_time: str = "30 seconds",
    bulk_endpoint: str | None = None,
    bulk_opts=None,
):
    """Wire the full ingest stream.  `source` must already contain
    IngestionData columns plus a nullable `parsed` marker column (from
    decode_json_payload); rows with parsed IS NULL go to the DLQ sink.
    For stateful cross-batch dedup compose `streaming_dedup` onto the
    source first (kept separate on purpose: it changes counter
    semantics — duplicates then never reach these metrics).

    Replay semantics: both sinks are idempotent under whole-batch replay
    (main: key-addressed last-write-wins on read; DLQ: one overwritten
    directory per epoch).  The in-memory counters double-count a
    replayed batch, exactly like the reference's Prometheus counters
    double-count a redelivered message.

    `tiebreak` breaks exact ingestion_time ties per key; it must not be
    one of key_cols (constant within the window partition = no-op).

    Returns the started StreamingQuery.  Trigger default availableNow
    (drain-and-stop, used by tests); production uses processingTime ≡
    the reference's BATCH_MAX_TIME=30s flush (.env:14).

    `bulk_endpoint` switches the main sink from the parquet
    dated-partition stand-in to the real ES `_bulk` wire protocol
    (sources/es_bulk.py): strict-mapping gate, per-partition bulk
    posts, per-ITEM failures routed to `<dlq_dir>/items/epoch=N` —
    the reference's intended R8+R9 semantics against a live cluster
    (or the pytest mock endpoint).  The parquet path remains the
    jar-free local default."""
    key_cols = key_cols or ["uuid"]
    if tiebreak in key_cols:
        raise ValueError(
            f"tiebreak {tiebreak!r} is a key column — ties on {ts_col} "
            "would resolve nondeterministically"
        )
    m = metrics if metrics is not None else StreamMetrics()

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # one source read + decode per batch, not one per action below
        batch_df.persist()
        try:
            # R4: split decodable vs poison rows.
            main_df, dlq_df = dlq_split(batch_df, F.col("parsed").isNotNull())
            n_dlq = dlq_df.count()
            if n_dlq:
                # one DLQ dir per epoch, overwritten: a replayed batch
                # rewrites the same directory instead of appending dups
                (dlq_df.select("raw_value")
                 .write.mode("overwrite").format("parquet")
                 .save(os.path.join(dlq_dir, f"epoch={epoch_id}")))
            # R5 + R8: derive, then last-write-wins within the batch (the
            # sink dir is keyed by uuid on read — see read_upserted below).
            derived = derive_ingest_cols(
                main_df.drop("parsed", "raw_value"), ms_col=ts_col
            )
            n_main = derived.count()  # pre-collapse (feeds `received`)
            n_item_dlq = 0
            n_indexed = 0
            if n_main:
                deduped = upsert_last_write_wins(
                    derived, key_cols, "ingestion_time", tiebreak
                )
                if bulk_endpoint is not None:
                    # R8 over the wire: ES collapses doc-ids itself, but
                    # the in-batch upsert still saves redundant sends
                    from go_pulsar_elasticsearch_spark.sources.es_bulk import (
                        write_batch_via_bulk,
                    )

                    res = write_batch_via_bulk(
                        deduped.drop("ingest_date"),
                        epoch_id,
                        bulk_endpoint,
                        os.path.join(dlq_dir, "items"),
                        opts=bulk_opts,
                    )
                    n_item_dlq = res["dlq"]
                    # bulk branch: successes among the DEDUPED sends —
                    # same base as n_item_dlq, so indexed + dlq can
                    # never overcount under in-batch duplicates
                    n_indexed = res["indexed"]
                else:
                    # R11: dated partitions behind the stable sink path.
                    # indexed counts what the sink actually receives —
                    # the DEDUPED rows — the same base as the bulk
                    # branch, so in-batch duplicates never overcount
                    n_indexed = deduped.count()
                    (deduped.withColumn("tags_json", F.to_json("tags")).drop("tags")
                     .write.mode("append").partitionBy("ingest_date")
                     .format("parquet").save(sink_dir))
            m.received += n_main + n_dlq
            m.indexed += n_indexed
            m.index_errors += n_item_dlq
            m.dlq += n_dlq + n_item_dlq
            m.batches.append({"epoch": epoch_id, "main": n_indexed,
                              "dlq": n_dlq + n_item_dlq})
        finally:
            batch_df.unpersist()

    writer = (
        source.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_upserted(spark: SparkSession, sink_dir: str,
                  key_cols: list[str] | None = None,
                  tiebreak: str = "identifier") -> DataFrame:
    """Reader-side view of the key-addressed sink: replays/duplicates
    across batches collapse to last-write-wins, exactly like ES doc-id
    indexing collapses re-delivered messages (`es.go:186`).

    Raises ValueError with a clear message when the sink holds no data
    (e.g. every record was poison and went to the DLQ)."""
    key_cols = key_cols or ["uuid"]
    try:
        df = spark.read.parquet(sink_dir)
    except Exception as exc:
        raise ValueError(
            f"ingest sink {sink_dir!r} holds no data — no decodable "
            "records were written (check the DLQ dir)"
        ) from exc
    return upsert_last_write_wins(df, key_cols, "ingestion_time", tiebreak)


def streaming_dedup(source: DataFrame, key_cols: list[str],
                    event_time: str, watermark: str) -> DataFrame:
    """R8 stateful form: dropDuplicates with a watermark bounds state —
    the streaming equivalent of the uuid doc-id upsert."""
    return source.withWatermark(event_time, watermark).dropDuplicates(
        key_cols
    )


def streaming_dedup_within_watermark(
    source: DataFrame, key_cols: list[str], event_time: str, watermark: str
) -> DataFrame:
    """Spark-4 variant: dropDuplicatesWithinWatermark guarantees dedup
    only for duplicates arriving within the watermark delay of each
    other and EVICTS state afterwards — bounded state without needing
    the duplicate horizon to be exact.  At 100 TB/day this is the form
    that survives: plain dropDuplicates keys state on values seen since
    the stream began unless the event-time column itself is a key."""
    return source.withWatermark(
        event_time, watermark
    ).dropDuplicatesWithinWatermark(key_cols)


def windowed_counts(source: DataFrame, event_time: str = "ingestion_time",
                    window: str = "1 minute",
                    watermark: str = "2 minutes") -> DataFrame:
    """Event-time tumbling aggregation with late-data handling — streaming
    twin of stream_tumbling_window_agg (batch-certified)."""
    return (
        source.withWatermark(event_time, watermark)
        .groupBy(F.window(event_time, window), "type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "type",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# certified query: the whole streaming pipeline, drained (rows-only — the
# persist_time column is processing-time and the sink path is a temp dir)
# --------------------------------------------------------------------------

from go_pulsar_elasticsearch_spark.registry import register  # noqa: E402


@register("stream_ingest_e2e")
def stream_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1-R11 end-to-end under the driver: events rows are serialized to
    IngestionData JSON, streamed through decode -> derive -> upsert ->
    dated sink with availableNow, and the upserted sink contents are
    returned.  Rows-only certification (persist_time is nondeterministic);
    the per-stage transforms are separately oracled."""
    import tempfile

    from go_pulsar_elasticsearch_spark.catalog import t as _t
    from go_pulsar_elasticsearch_spark.session import tune as _tune

    _tune(spark)
    tmp = tempfile.mkdtemp(prefix="gpe_stream_e2e_")
    src_dir = os.path.join(tmp, "src")
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    payload = ev.select(
        F.to_json(
            F.struct(
                F.concat(F.lit("id-"), F.col("event_id")).alias("identifier"),
                F.col("event_type").alias("name"),
                # duplicate uuids on purpose: upsert collapses them
                F.concat(F.lit("uuid-"), F.col("event_id") % 500).alias("uuid"),
                F.col("event_type").alias("type"),
                F.unix_millis("ts").alias("ingestion_time"),
            )
        ).alias("value")
    )
    payload.write.mode("overwrite").format("parquet").save(src_dir)
    raw = file_stream(spark, src_dir, schema="value string", max_files=64)
    q = run_ingest_pipeline(
        spark,
        decode_json_payload(raw),
        sink_dir=os.path.join(tmp, "sink"),
        dlq_dir=os.path.join(tmp, "dlq"),
        checkpoint_dir=os.path.join(tmp, "ckpt"),
    )
    q.awaitTermination()
    return read_upserted(spark, os.path.join(tmp, "sink"))


def with_retries(fn, retries: int = 10, base_delay_s: float = 0.1,
                 sleep=None):
    """R12 (`es.go:133-158`, `pulsar.go:65-78`): bounded retry with
    exponential backoff for sink/side-effect calls inside foreachBatch —
    delay doubles each attempt, re-raises after `retries` total attempts
    (always at least one: retries<=1 means try once, no retry).
    Spark task retry covers compute failures; this covers the external
    system the task talks to."""
    import time as _time

    sleep = sleep or _time.sleep
    attempts = max(1, retries)

    def wrapped(*args, **kwargs):
        delay = base_delay_s
        for attempt in range(attempts):
            try:
                return fn(*args, **kwargs)
            except Exception:
                if attempt == attempts - 1:
                    raise
                sleep(delay)
                delay *= 2  # pulsar.go:75: sleep doubles each try

    return wrapped
