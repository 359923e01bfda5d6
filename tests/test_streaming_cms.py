"""Streaming CMS frequency monitor: bit-exact convergence to the batch
sketch, replay idempotence, and prior-epoch-only reads."""

from __future__ import annotations

from pyspark.sql import functions as F

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions import cms
from go_pulsar_elasticsearch_spark.operators.aggregates import _CMS_PROBE_IDS
from go_pulsar_elasticsearch_spark.streaming.cms_monitor import (
    batch_sketches,
    merged_sketches,
    probe_estimates,
    run_cms_monitor,
    write_epoch,
)

gpe.load_all()


def _events(spark, sf_dir):
    return t(spark, sf_dir, "events").select("event_type", "user_id")


def test_merged_store_equals_single_pass_bytes(spark, sf_dir, tmp_path):
    """After the drain, merging the epoch sketches must reproduce the
    single-pass whole-corpus sketch BYTE-FOR-BYTE per type."""
    ev = _events(spark, sf_dir)
    src = str(tmp_path / "events")
    for m in range(3):  # three files -> three micro-batches
        ev.filter(F.col("user_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = str(tmp_path / "store")
    run_cms_monitor(spark, src, store, str(tmp_path / "ckpt"))

    got = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }
    want = {
        r["event_type"]: bytes(r["sk"])
        for r in batch_sketches(ev).collect()
    }
    assert got == want

    # and the probe surface agrees with the certified batch operator
    from go_pulsar_elasticsearch_spark.registry import QUERIES

    live = {
        (r["event_type"], r["user_id"]): (r["est_count"], r["n_events"])
        for r in probe_estimates(
            merged_sketches(spark, store), list(_CMS_PROBE_IDS)
        ).collect()
    }
    batch = {
        (r["event_type"], r["user_id"]): (r["est_count"], r["n_events"])
        for r in QUERIES["agg_count_min"](spark, sf_dir).collect()
    }
    assert live == batch


def test_replay_same_epoch_is_idempotent(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    b0 = ev.filter(F.col("user_id") % 3 == 0)
    store = str(tmp_path / "store")
    write_epoch(b0, store, epoch_id=0)
    first = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }
    write_epoch(b0, store, epoch_id=0)  # simulated checkpoint replay
    second = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }
    assert first == second
    # totals reflect ONE delivery of the batch, not two
    n = sum(
        r["n_events"] for r in merged_sketches(spark, store).collect()
    )
    assert n == b0.count()


def test_mid_stream_read_sees_prior_epochs_only(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    store = str(tmp_path / "store")
    write_epoch(ev.filter(F.col("user_id") % 3 == 0), store, 0)
    write_epoch(ev.filter(F.col("user_id") % 3 == 1), store, 1)
    below = merged_sketches(spark, store, below_epoch=1)
    want = {
        r["event_type"]: bytes(r["sk"])
        for r in batch_sketches(
            ev.filter(F.col("user_id") % 3 == 0)
        ).collect()
    }
    got = {r["event_type"]: bytes(r["sk"]) for r in below.collect()}
    assert got == want


def test_compaction_preserves_merged_bytes_and_bounds_store(
    spark, sf_dir, tmp_path
):
    from go_pulsar_elasticsearch_spark.streaming.cms_monitor import (
        compact_store,
    )
    import glob

    ev = _events(spark, sf_dir)
    store = str(tmp_path / "store")
    for e in range(4):
        write_epoch(ev.filter(F.col("user_id") % 4 == e), store, e)
    before = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }
    before_replay = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store, below_epoch=3).collect()
    }
    removed = compact_store(spark, store, below_epoch=3)
    assert removed == 2  # epochs 0,1 folded into 2; epoch 3 untouched
    dirs = sorted(glob.glob(store + "/epoch=*"))
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["2", "3"]
    after = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }
    after_replay = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store, below_epoch=3).collect()
    }
    assert after == before
    assert after_replay == before_replay
    # idempotent: nothing left to fold below 3
    assert compact_store(spark, store, below_epoch=3) == 0


def test_compaction_resumes_after_crash(spark, sf_dir, tmp_path, monkeypatch):
    """Kill the protocol right after the completion marker (phase 2->3
    boundary): a re-run must finish and converge to identical bytes."""
    import shutil as _shutil

    from go_pulsar_elasticsearch_spark.streaming import cms_monitor

    ev = _events(spark, sf_dir)
    store = str(tmp_path / "store")
    for e in range(3):
        write_epoch(ev.filter(F.col("user_id") % 3 == e), store, e)
    want = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }

    real_rmtree = _shutil.rmtree
    calls = {"n": 0}

    def dying_rmtree(path, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash mid-delete")
        return real_rmtree(path, **kw)

    monkeypatch.setattr("shutil.rmtree", dying_rmtree)
    try:
        cms_monitor.compact_store(spark, store, below_epoch=3)
    except RuntimeError:
        pass
    monkeypatch.setattr("shutil.rmtree", real_rmtree)

    # resume: marker present -> finish deletes + rename
    cms_monitor.compact_store(spark, store, below_epoch=3)
    got = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }
    assert got == want


def _crash_compact_at(spark, sf_dir, tmp_path, monkeypatch, attr, when):
    """Run compact_store with an injected crash in os.<attr> (the
    `when`-th call), then resume and return (want, got) merged bytes."""
    import os as _os

    from go_pulsar_elasticsearch_spark.streaming import cms_monitor

    ev = _events(spark, sf_dir)
    store = str(tmp_path / "store")
    for e in range(3):
        write_epoch(ev.filter(F.col("user_id") % 3 == e), store, e)
    want = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }

    real = getattr(_os, attr)
    calls = {"n": 0}

    def dying(*a, **kw):
        calls["n"] += 1
        if calls["n"] == when:
            raise RuntimeError("injected crash")
        return real(*a, **kw)

    monkeypatch.setattr("os." + attr, dying)
    try:
        cms_monitor.compact_store(spark, store, below_epoch=3)
    except RuntimeError:
        pass
    monkeypatch.setattr("os." + attr, real)

    cms_monitor.compact_store(spark, store, below_epoch=3)
    got = {
        r["event_type"]: bytes(r["sk"])
        for r in merged_sketches(spark, store).collect()
    }
    return want, got


def test_compaction_crash_after_publish_before_marker_removal(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The round-4 ADVICE window: scratch already renamed to the
    target epoch, marker still present.  Resume must NOT treat the
    published target as junk — it clears the marker and converges."""
    # os.remove call #1 inside compact_store is the marker removal
    # (the marker itself is published via os.rename, not remove).
    want, got = _crash_compact_at(
        spark, sf_dir, tmp_path, monkeypatch, "remove", when=1
    )
    assert got == want


def test_compaction_crash_before_publish_rename(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash after the folded-epoch deletes but before the scratch is
    renamed: marker + complete scratch survive; resume publishes."""
    # os.rename call #1 publishes the marker; call #2 is the scratch
    # -> epoch=<target> publish.  Kill the second.
    want, got = _crash_compact_at(
        spark, sf_dir, tmp_path, monkeypatch, "rename", when=2
    )
    assert got == want
