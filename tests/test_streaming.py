"""Structured Streaming semantics the oracle can't certify: watermarks,
stateful dedup across micro-batches, checkpoint replay idempotency, DLQ
routing, and the metrics listener (reference R3-R9, R13)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.ingest.pipeline import upsert_last_write_wins
from go_pulsar_elasticsearch_spark.streaming.stream import (
    INGESTION_SCHEMA,
    StreamMetrics,
    decode_json_payload,
    file_stream,
    read_upserted,
    run_ingest_pipeline,
    windowed_counts,
)


def _payload(identifier, uuid, ms, typ="doc", name="n", tags=None):
    d = {
        "identifier": identifier,
        "name": name,
        "uuid": uuid,
        "type": typ,
        "ingestion_time": ms,
    }
    if tags is not None:
        d["tags"] = tags
    return json.dumps(d)


@pytest.fixture()
def ingest_dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "sink": str(tmp_path / "sink"),
        "dlq": str(tmp_path / "dlq"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _write_batch(spark, src_dir, rows):
    spark.createDataFrame([(r,) for r in rows], "value string").coalesce(1).write.mode(
        "append"
    ).format("parquet").save(src_dir)


def _run(spark, d, metrics=None):
    raw = file_stream(
        spark, d["src"], schema="value string", fmt="parquet", max_files=1
    )
    q = run_ingest_pipeline(
        spark,
        decode_json_payload(raw),
        sink_dir=d["sink"],
        dlq_dir=d["dlq"],
        checkpoint_dir=d["ckpt"],
        metrics=metrics,
    )
    q.awaitTermination()
    return q


BASE_MS = 1_700_000_000_000


def test_ingest_pipeline_end_to_end(spark, ingest_dirs):
    """R3-R11 in one flow: decode, derive, upsert, DLQ, dated partitions."""
    rows = [
        _payload("a", "u1", BASE_MS),
        _payload("b", "u1", BASE_MS + 5000),          # same uuid, later -> wins
        _payload("c", "u2", BASE_MS + 86_400_000,     # next day partition
                 tags=[{"type": "k", "value": "v"}]),
        "{not json at all",                            # -> DLQ
    ]
    m = StreamMetrics()
    _write_batch(spark, ingest_dirs["src"], rows)
    _run(spark, ingest_dirs, metrics=m)

    out = read_upserted(spark, ingest_dirs["sink"]).collect()
    by_uuid = {r["uuid"]: r for r in out}
    assert set(by_uuid) == {"u1", "u2"}
    assert by_uuid["u1"]["identifier"] == "b"  # last write won
    # R5 derivations present and typed
    assert by_uuid["u2"]["ingestion_time"].day != by_uuid["u1"]["ingestion_time"].day
    assert by_uuid["u1"]["persist_time"] is not None
    assert json.loads(by_uuid["u2"]["tags_json"])[0]["value"] == "v"
    # R11: two dated partition dirs
    parts = {p for p in os.listdir(ingest_dirs["sink"]) if p.startswith("ingest_date=")}
    assert len(parts) == 2
    # R4: poison row in DLQ
    dlq = spark.read.parquet(ingest_dirs["dlq"]).collect()
    assert len(dlq) == 1 and dlq[0]["raw_value"].startswith("{not json")
    # R13 counters: received counts every message (4: three decodable +
    # one poison); indexed counts rows the SINK actually received — the
    # in-batch u1 duplicate collapses before the write, same base as
    # the bulk branch's per-item accounting (round-5 review fix)
    assert m.received == 4 and m.indexed == 2 and m.dlq == 1


def test_replay_is_idempotent(spark, ingest_dirs):
    """R8/R9: re-delivering the same payloads (new batch, same uuids) must
    not duplicate — the key-addressed sink collapses replays."""
    rows = [_payload("a", "u1", BASE_MS), _payload("c", "u2", BASE_MS)]
    _write_batch(spark, ingest_dirs["src"], rows)
    _run(spark, ingest_dirs)
    _write_batch(spark, ingest_dirs["src"], rows)  # replay
    _run(spark, ingest_dirs)
    out = read_upserted(spark, ingest_dirs["sink"])
    assert out.count() == 2
    # raw sink holds 4 rows; the reader collapses them
    assert spark.read.parquet(ingest_dirs["sink"]).count() == 4


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Stateful dropDuplicates with watermark dedupes across micro-batches
    via the state store (unlike per-batch upsert)."""
    src = str(tmp_path / "src")
    out_table = "dedup_out"
    for batch in (
        [("u1", BASE_MS), ("u2", BASE_MS + 1000)],
        [("u1", BASE_MS), ("u3", BASE_MS + 2000)],  # u1 is a cross-batch dup
    ):
        spark.createDataFrame(batch, "uuid string, ms long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("uuid string, ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ingestion_time", F.timestamp_millis("ms"))
        .withWatermark("ingestion_time", "10 minutes")
        .dropDuplicates(["uuid"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["uuid"] for r in spark.table(out_table).collect()}
    assert got == {"u1", "u2", "u3"}
    assert spark.table(out_table).count() == 3  # u1 emitted once


def test_windowed_counts_with_watermark(spark, tmp_path):
    """Event-time tumbling window + watermark over a streaming source."""
    src = str(tmp_path / "src")
    # batch 1: the windows under test; batch 2: a much-later event that
    # advances the watermark past them (append mode only emits windows
    # the watermark has closed — a window flushes one batch later).
    for batch in (
        [("a", BASE_MS), ("a", BASE_MS + 10_000), ("b", BASE_MS + 70_000)],
        [("c", BASE_MS + 3_600_000)],
    ):
        spark.createDataFrame(batch, "type string, ms long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("type string, ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ingestion_time", F.timestamp_millis("ms"))
    )
    agg = windowed_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["type"], r["n_events"]) for r in spark.table("win_out").collect()}
    assert got == {("a", 2), ("b", 1)}


def test_metrics_listener_health(spark, tmp_path):
    """R13/R14: observe() counters surface through the listener; health()
    mirrors the reference's HealthStatus shape."""
    from go_pulsar_elasticsearch_spark.streaming.listener import (
        MetricsListener,
        with_counters,
    )

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "src")
        rows = [_payload("a", "u1", BASE_MS), "garbage"]
        _write_batch(spark, src, rows)
        raw = file_stream(spark, src, schema="value string", fmt="parquet")
        decoded = with_counters(decode_json_payload(raw))
        q = (
            decoded.writeStream.format("memory")
            .queryName("obs_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import time

        for _ in range(40):  # listener events are async
            if listener.received >= 2:
                break
            time.sleep(0.25)
        assert listener.received == 2
        assert listener.decode_errors == 1
        h = listener.health(q)
        assert set(h) >= {"status", "detail", "received", "decode_errors"}
    finally:
        spark.streams.removeListener(listener)


def test_avro_decode_real_bytes_end_to_end(spark):
    """R3 for real: IngestionData records are ENCODED to Avro binary
    (pure-spec codec) and decoded back through decode_avro_payload —
    values, the null-union tags branch, the populated tags branch, and
    PERMISSIVE nulling of garbage all verified.  Runs the mapInPandas
    path here (no spark-avro jar); the from_avro path shares the output
    contract."""
    from go_pulsar_elasticsearch_spark.ingest.avro import (
        INGESTION_AVRO_SCHEMA,
        decode_avro_payload,
    )
    from go_pulsar_elasticsearch_spark.ingest.avro_codec import (
        encode,
        parse_schema,
    )

    schema = parse_schema(INGESTION_AVRO_SCHEMA)
    recs = [
        {
            "identifier": "id-1", "name": "alpha", "uuid": "u-1",
            "type": "metric", "ingestion_time": 1700000000123,
            "tags": [{"type": "env", "value": "prod"},
                     {"type": "dc", "value": "eu-1"}],
        },
        {   # null-union branch of tags
            "identifier": "id-2", "name": "beta", "uuid": "u-2",
            "type": "log", "ingestion_time": -5, "tags": None,
        },
    ]
    rows = [(encode(schema, r),) for r in recs]
    rows.append((b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff",))  # garbage
    rows.append((rows[0][0] + b"trailing",))  # valid prefix + junk
    df = spark.createDataFrame(rows, "value binary")
    out = {r["raw_value"]: r for r in decode_avro_payload(df).collect()}
    assert len(out) == 4
    r1 = out[bytes(rows[0][0])]
    assert (r1["identifier"], r1["name"], r1["uuid"], r1["type"]) == (
        "id-1", "alpha", "u-1", "metric")
    assert r1["ingestion_time"] == 1700000000123
    assert [(t["type"], t["value"]) for t in r1["tags"]] == [
        ("env", "prod"), ("dc", "eu-1")]
    assert r1["parsed"] is not None and r1["parsed"]["uuid"] == "u-1"
    r2 = out[bytes(rows[1][0])]
    assert r2["uuid"] == "u-2" and r2["ingestion_time"] == -5
    assert r2["tags"] is None and r2["parsed"] is not None
    for bad in (bytes(rows[2][0]), bytes(rows[3][0])):
        assert out[bad]["parsed"] is None and out[bad]["uuid"] is None


def test_avro_codec_roundtrip_property():
    """Codec self-consistency on the reference schema: encode -> decode
    is identity across string/long/union/array shapes, including empty
    arrays, empty strings, unicode, and extreme longs."""
    from go_pulsar_elasticsearch_spark.ingest.avro import INGESTION_AVRO_SCHEMA
    from go_pulsar_elasticsearch_spark.ingest.avro_codec import (
        decode,
        encode,
        parse_schema,
    )

    schema = parse_schema(INGESTION_AVRO_SCHEMA)
    cases = [
        {"identifier": "", "name": "naïve — ünïcode", "uuid": "u",
         "type": "t", "ingestion_time": 2**62, "tags": []},
        {"identifier": "x" * 1000, "name": "n", "uuid": "u2",
         "type": "t", "ingestion_time": -(2**62), "tags": None},
        {"identifier": "a", "name": "b", "uuid": "c", "type": "d",
         "ingestion_time": 0,
         "tags": [{"type": "", "value": ""}] * 7},
    ]
    for rec in cases:
        assert decode(schema, encode(schema, rec)) == rec


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user totals accumulate across
    micro-batches through the state store."""
    from go_pulsar_elasticsearch_spark.streaming.stateful import (
        user_running_totals,
    )

    src = str(tmp_path / "src")
    for batch in (
        [(1, 10.0, BASE_MS), (1, 5.0, BASE_MS + 1000), (2, 1.0, BASE_MS)],
        [(1, 2.5, BASE_MS + 2000)],
    ):
        spark.createDataFrame(
            batch, "user_id long, value double, ms long"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, value double, ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("state_out").collect()
    # last emission per user wins (update mode re-emits on change)
    latest = {}
    for r in rows:
        latest[r["user_id"]] = r
    assert latest[1]["total_events"] == 3
    assert latest[1]["total_value"] == pytest.approx(17.5)
    assert latest[1]["last_ms"] == BASE_MS + 2000
    assert latest[2]["total_events"] == 1


def test_retry_backoff_recovers_and_gives_up():
    """R12: delay doubles per attempt; success stops retrying; exhaustion
    re-raises."""
    from go_pulsar_elasticsearch_spark.streaming.stream import with_retries

    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient 503")
        return "ok"

    ok = with_retries(flaky, retries=5, base_delay_s=0.1, sleep=sleeps.append)()
    assert ok == "ok" and calls["n"] == 3
    assert sleeps == [0.1, 0.2]

    def always_down():
        raise IOError("down")

    sleeps2 = []
    with pytest.raises(IOError):
        with_retries(always_down, retries=3, base_delay_s=0.1, sleep=sleeps2.append)()
    assert sleeps2 == [0.1, 0.2]


def test_rate_source_feeds_pipeline(spark, tmp_path):
    """R1 stand-in: the rate source (Spark's built-in unbounded generator)
    drives the same derive/dedup transforms — proves the pipeline is
    source-agnostic (Pulsar connector swaps in via sources/pulsar.py)."""
    from go_pulsar_elasticsearch_spark.ingest.pipeline import derive_ingest_cols

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .load()
        .select(
            F.concat(F.lit("uuid-"), F.col("value")).alias("uuid"),
            F.unix_millis("timestamp").alias("ingestion_ms"),
        )
    )
    derived = derive_ingest_cols(rate, ms_col="ingestion_ms")
    q = (
        derived.writeStream.format("memory")
        .queryName("rate_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline and spark.table("rate_out").count() == 0:
            time.sleep(0.5)
        rows = spark.table("rate_out").collect()
        assert len(rows) > 0
        assert rows[0]["ingestion_time"] is not None
        assert rows[0]["persist_time"] is not None
        assert rows[0]["ingest_date"] is not None
    finally:
        q.stop()


def test_checkpoint_recovers_after_sink_failure(spark, ingest_dirs):
    """R9 done right: a sink crash fails the batch; restarting from the
    checkpoint replays it; the key-addressed sink keeps the result exactly
    -once.  (The reference nacks and redelivers per message — same goal,
    but its `found` flag bug acks unindexed messages; see SURVEY R9.)"""
    rows = [_payload("a", "u1", BASE_MS), _payload("b", "u2", BASE_MS)]
    _write_batch(spark, ingest_dirs["src"], rows)

    calls = {"n": 0}
    from go_pulsar_elasticsearch_spark.streaming.stream import (
        decode_json_payload as _dec,
        file_stream as _fs,
        run_ingest_pipeline as _run_pipe,
    )

    # wrap run_ingest_pipeline's sink via a failing foreachBatch first
    raw = _fs(spark, ingest_dirs["src"], schema="value string", max_files=1)

    def failing_batch(batch_df, epoch_id):
        calls["n"] += 1
        raise IOError("sink down")

    q = (
        _dec(raw)
        .writeStream.foreachBatch(failing_batch)
        .option("checkpointLocation", ingest_dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    assert calls["n"] >= 1  # the batch ran and failed -> NOT committed

    # restart with the healthy pipeline on the SAME checkpoint
    q2 = _run_pipe(
        spark,
        _dec(_fs(spark, ingest_dirs["src"], schema="value string", max_files=1)),
        sink_dir=ingest_dirs["sink"],
        dlq_dir=ingest_dirs["dlq"],
        checkpoint_dir=ingest_dirs["ckpt"],
    )
    q2.awaitTermination()
    out = read_upserted(spark, ingest_dirs["sink"])
    assert {r["uuid"] for r in out.collect()} == {"u1", "u2"}
    assert out.count() == 2


def test_session_window_streaming_mode(spark, tmp_path):
    """session_window in streaming append mode: sessions close when the
    watermark passes their end; the batch-certified stream_session_window
    query uses the identical expression."""
    src = str(tmp_path / "src")
    for batch in (
        # user 1: two events 1 min apart -> one session; user 2: one event
        [(1, BASE_MS), (1, BASE_MS + 60_000), (2, BASE_MS)],
        [(3, BASE_MS + 7_200_000)],  # 2h later: closes everything prior
    ):
        spark.createDataFrame(batch, "user_id long, ms long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_millis("ms"))
        .withWatermark("ts", "5 minutes")
    )
    agg = (
        stream.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["user_id"], r["n"]) for r in spark.table("sess_out").collect()}
    assert (1, 2) in got and (2, 1) in got
    for r in spark.table("sess_out").collect():
        if r["user_id"] == 1:
            # end = last event + gap
            assert (r["e"] - r["s"]).total_seconds() == 60 + 600


def test_http_health_and_metrics_endpoints(spark, tmp_path):
    """R14: /health /ready /metrics served over HTTP with the reference's
    HealthStatus shape and Prometheus counter exposition; R16: the
    shutdown handler stops the query and the server."""
    import urllib.request

    from go_pulsar_elasticsearch_spark.streaming.http_health import (
        install_shutdown_handler,
        serve_health,
    )
    from go_pulsar_elasticsearch_spark.streaming.listener import (
        MetricsListener,
        with_counters,
    )

    listener = MetricsListener()
    spark.streams.addListener(listener)
    server = None
    try:
        src = str(tmp_path / "src")
        _write_batch(spark, src, [_payload("a", "u1", BASE_MS), "junk"])
        raw = file_stream(spark, src, schema="value string", fmt="parquet")
        q = (
            with_counters(decode_json_payload(raw))
            .writeStream.format("memory")
            .queryName("health_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import time

        for _ in range(40):
            if listener.received >= 2:
                break
            time.sleep(0.25)

        server, _, port = serve_health(listener, q)
        health = json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/health").read()
        )
        assert health["status"] in ("UP", "DOWN")
        assert health["received"] == 2 and health["decode_errors"] == 1
        ready = urllib.request.urlopen(f"http://127.0.0.1:{port}/ready")
        assert ready.status == 200
        metrics = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics"
        ).read().decode()
        assert "gpe_received_total 2" in metrics
        assert "gpe_decode_errors_total 1" in metrics
        assert "# TYPE gpe_received_total counter" in metrics
        # 404 for unknown path
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # R16: direct invocation of the shutdown handler
        handler = install_shutdown_handler([q], server)
        handler()
        assert not q.isActive
    finally:
        if server is not None:
            server.server_close()
        spark.streams.removeListener(listener)


def test_all_poison_stream_raises_clear_error(spark, ingest_dirs):
    """Every record poison -> DLQ populated, main sink empty, and
    read_upserted fails with a clear message instead of an opaque
    AnalysisException."""
    _write_batch(spark, ingest_dirs["src"], ["junk1", "junk2"])
    m = StreamMetrics()
    _run(spark, ingest_dirs, metrics=m)
    assert m.dlq == 2 and m.indexed == 0
    assert spark.read.parquet(ingest_dirs["dlq"]).count() == 2
    with pytest.raises(ValueError, match="no decodable"):
        read_upserted(spark, ingest_dirs["sink"]).collect()


def test_dlq_replay_does_not_duplicate(spark, ingest_dirs):
    """Redelivery of an already-DLQ'd batch (simulated by wiping the
    checkpoint) overwrites the same epoch directory — poison rows are
    never double-counted in the DLQ."""
    import shutil

    rows = [_payload("a", "u1", BASE_MS), "poison row"]
    _write_batch(spark, ingest_dirs["src"], rows)
    _run(spark, ingest_dirs)
    assert spark.read.parquet(ingest_dirs["dlq"]).count() == 1
    shutil.rmtree(ingest_dirs["ckpt"])  # forget progress -> full replay
    _run(spark, ingest_dirs)
    # DLQ still holds exactly one copy (epoch dir overwritten);
    # the main sink collapses the replayed row by key
    assert spark.read.parquet(ingest_dirs["dlq"]).count() == 1
    assert read_upserted(spark, ingest_dirs["sink"]).count() == 1


def test_tiebreak_must_not_be_key(spark, ingest_dirs):
    _write_batch(spark, ingest_dirs["src"], [_payload("a", "u1", BASE_MS)])
    raw = file_stream(spark, ingest_dirs["src"], schema="value string")
    with pytest.raises(ValueError, match="tiebreak"):
        run_ingest_pipeline(
            spark,
            decode_json_payload(raw),
            sink_dir=ingest_dirs["sink"],
            dlq_dir=ingest_dirs["dlq"],
            checkpoint_dir=ingest_dirs["ckpt"],
            tiebreak="uuid",
        )


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: every micro-batch is enriched against a static
    dimension (the lookup-table pattern the reference would need a cache
    for; Spark broadcasts the dim into each batch).  Unmatched keys
    survive with NULLs — enrichment must never drop events."""
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "basic")], "user string, tier string"
    )
    src = str(tmp_path / "src")
    for batch in ([("u1", 1), ("u3", 2)], [("u2", 3)]):
        spark.createDataFrame(batch, "user string, n long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("user string, n long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = stream.join(F.broadcast(dim), "user", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["user"]: r["tier"] for r in spark.table("enrich_out").collect()}
    assert rows == {"u1": "gold", "u2": "basic", "u3": None}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    watermark delay of each other are suppressed, state is evicted
    afterwards — the bounded-state dedup form for long-running
    streams."""
    from go_pulsar_elasticsearch_spark.streaming.stream import (
        streaming_dedup_within_watermark,
    )

    src = str(tmp_path / "src")
    out_table = "dedup_wwm_out"
    for batch in (
        [("u1", BASE_MS), ("u2", BASE_MS + 1000)],
        [("u1", BASE_MS + 2000), ("u3", BASE_MS + 3000)],  # u1 dup, 2s apart
    ):
        spark.createDataFrame(batch, "uuid string, ms long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("uuid string, ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ingestion_time", F.timestamp_millis("ms"))
    )
    deduped = streaming_dedup_within_watermark(
        stream, ["uuid"], "ingestion_time", "10 minutes"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [r["uuid"] for r in spark.table(out_table).collect()]
    assert sorted(set(got)) == ["u1", "u2", "u3"]
    assert len(got) == 3  # the 2s-apart u1 duplicate was suppressed
