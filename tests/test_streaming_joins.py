"""Stream-stream interval join: true streaming path across micro-batches
must emit exactly the batch-analog rows, and watermark expiry must drop
state for far-late arrivals."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.streaming.joins import interval_join

gpe.load_all()

BASE_MS = 1_700_000_000_000


def _views(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, view_id long, ms long"
    ).select("user_id", "view_id", F.timestamp_millis("ms").alias("view_ts"))


def _clicks(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, click_id long, ms long"
    ).select("user_id", "click_id", F.timestamp_millis("ms").alias("click_ts"))


def _run_streaming_join(spark, tmp_path, view_batches, click_batches, name):
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    for b in view_batches:
        _views(spark, b).coalesce(1).write.mode("append").parquet(vsrc)
    for b in click_batches:
        _clicks(spark, b).coalesce(1).write.mode("append").parquet(csrc)
    v = (
        spark.readStream.schema("user_id long, view_id long, view_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(vsrc)
    )
    c = (
        spark.readStream.schema("user_id long, click_id long, click_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(csrc)
        .withColumnRenamed("user_id", "c_user")
    )
    joined = interval_join(
        v, c, "view_ts", "click_ts", "user_id", "c_user"
    ).select("user_id", "view_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_join_matches_batch_analog(spark, tmp_path):
    views = [
        [(1, 10, BASE_MS), (2, 20, BASE_MS + 1000)],
        [(3, 30, BASE_MS + 60_000)],
    ]
    clicks = [
        [(1, 100, BASE_MS + 120_000)],          # within 5 min of view 10
        [(2, 200, BASE_MS + 400_000)],          # 6.6 min after view 20 -> out
        [(3, 300, BASE_MS + 90_000)],           # 30 s after view 30 -> in
    ]
    got = _run_streaming_join(spark, tmp_path, views, clicks, "ssj_out")
    rows = {(r["user_id"], r["view_id"], r["click_id"]) for r in got.collect()}
    assert rows == {(1, 10, 100), (3, 30, 300)}

    # batch analog over the same rows produces the same pairs
    v = _views(spark, [x for b in views for x in b])
    c = _clicks(spark, [x for b in clicks for x in b]).withColumnRenamed(
        "user_id", "c_user"
    )
    from go_pulsar_elasticsearch_spark.streaming.joins import _join_cond

    batch = v.join(
        c,
        _join_cond(
            F.col("user_id"), F.col("c_user"), F.col("view_ts"), F.col("click_ts")
        ),
    )
    brows = {
        (r["user_id"], r["view_id"], r["click_id"]) for r in batch.collect()
    }
    assert brows == rows


def test_streaming_join_click_before_view_excluded(spark, tmp_path):
    views = [[(7, 70, BASE_MS + 60_000)]]
    clicks = [[(7, 700, BASE_MS)]]  # click precedes the view -> no pair
    got = _run_streaming_join(spark, tmp_path, views, clicks, "ssj_neg")
    assert got.count() == 0


def test_streaming_left_outer_emits_null_for_unmatched_view(spark, tmp_path):
    """LEFT OUTER stream-stream: a view with no in-window click emits a
    null-click row — but only after the watermark passes its window
    (the engine must prove no click can still arrive).  The final
    far-future click advances the watermark past every view."""
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    views = [
        [(1, 10, BASE_MS)],                   # will match
        [(2, 20, BASE_MS + 1000)],            # will NOT match
    ]
    clicks = [
        [(1, 100, BASE_MS + 60_000)],         # 1 min after view 10 -> in
        [(9, 900, BASE_MS + 7_200_000)],      # +2h: advances the watermark
    ]
    for b in views:
        _views(spark, b).coalesce(1).write.mode("append").parquet(vsrc)
    for b in clicks:
        _clicks(spark, b).coalesce(1).write.mode("append").parquet(csrc)

    def drain():
        v = (
            spark.readStream.schema(
                "user_id long, view_id long, view_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(vsrc)
        )
        c = (
            spark.readStream.schema(
                "user_id long, click_id long, click_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(csrc)
            .withColumnRenamed("user_id", "c_user")
        )
        joined = interval_join(
            v, c, "view_ts", "click_ts", "user_id", "c_user", join_type="left"
        ).select("user_id", "view_id", "click_id")
        q = (
            joined.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # two subtleties a continuously-running stream handles on its own:
    # (1) the global watermark is the MIN across both inputs (the safe
    # default policy), so BOTH sides need a far-future event before the
    # unmatched view's state can expire; (2) the null row is emitted on
    # a trigger AFTER the watermark advance — so feed both sides and
    # drain again.
    _views(spark, [(8, 80, BASE_MS + 7_260_000)]).coalesce(1).write.mode(
        "append"
    ).parquet(vsrc)
    _clicks(spark, [(9, 901, BASE_MS + 7_260_000)]).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    drain()
    _clicks(spark, [(9, 902, BASE_MS + 7_320_000)]).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    _views(spark, [(8, 81, BASE_MS + 7_320_000)]).coalesce(1).write.mode(
        "append"
    ).parquet(vsrc)
    drain()
    rows = {
        (r["user_id"], r["view_id"], r["click_id"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert (1, 10, 100) in rows           # matched pair
    assert (2, 20, None) in rows          # unmatched view -> null click


def test_streaming_full_outer_emits_both_unmatched_sides(spark, tmp_path):
    """FULL OUTER stream-stream: an unmatched view emits a null-click
    row AND an orphan click (no preceding in-window view) emits a
    null-view row, each once its side's state expires under the
    watermark.  Same advance-both-sides-then-drain dance as the left
    form."""
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    _views(spark, [(1, 10, BASE_MS), (2, 20, BASE_MS + 1000)]).coalesce(
        1
    ).write.mode("append").parquet(vsrc)
    # click 100 matches view 10; click 300 has NO view (user 3)
    _clicks(
        spark, [(1, 100, BASE_MS + 60_000), (3, 300, BASE_MS + 2000)]
    ).coalesce(1).write.mode("append").parquet(csrc)

    def drain():
        v = (
            spark.readStream.schema(
                "user_id long, view_id long, view_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(vsrc)
        )
        c = (
            spark.readStream.schema(
                "user_id long, click_id long, click_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(csrc)
            .withColumnRenamed("user_id", "c_user")
        )
        joined = interval_join(
            v, c, "view_ts", "click_ts", "user_id", "c_user",
            join_type="full",
        ).select(
            F.coalesce("user_id", "c_user").alias("uid"),
            "view_id",
            "click_id",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    for i in (0, 1):  # advance both watermarks, then drain the emits
        _views(
            spark, [(8, 80 + i, BASE_MS + 7_260_000 + i * 60_000)]
        ).coalesce(1).write.mode("append").parquet(vsrc)
        _clicks(
            spark, [(9, 900 + i, BASE_MS + 7_260_000 + i * 60_000)]
        ).coalesce(1).write.mode("append").parquet(csrc)
        drain()
    rows = {
        (r["uid"], r["view_id"], r["click_id"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert (1, 10, 100) in rows           # matched pair
    assert (2, 20, None) in rows          # unmatched view -> null click
    assert (3, None, 300) in rows         # orphan click -> null view


def test_stream_static_enrich_matches_batch_analog(spark, sf_dir, tmp_path):
    """The true streaming path (readStream over event files joined to
    the static dims) must emit exactly the batch analog's rows, across
    multiple micro-batches."""
    from go_pulsar_elasticsearch_spark.catalog import t
    from go_pulsar_elasticsearch_spark.streaming.joins import (
        static_enrich,
        stream_static_enrich,
    )

    src = str(tmp_path / "ev")
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    # three files -> three micro-batches at maxFilesPerTrigger=1
    ev.filter(F.col("event_id") % 3 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") % 3 == 1).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") % 3 == 2).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_id long, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = static_enrich(
        stream, t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    ).select("event_id", "user_id", "event_type", "mktsegment", "nation")
    q = (
        enriched.writeStream.format("memory")
        .queryName("static_enrich_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("static_enrich_t").collect()}
    want = {tuple(r) for r in stream_static_enrich(spark, sf_dir).collect()}
    assert got == want
    assert len(want) > 0
