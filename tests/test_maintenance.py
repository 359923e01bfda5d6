"""Small-file compaction: file-count reduction, content equality, and
REAL data-skipping evidence from parquet footer stats."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.maintenance import (
    compact_dataset,
    plan_file_count,
    replace_dataset_in_place,
)


def _files(d):
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def _rows(spark, d):
    return {
        tuple(r) for r in spark.read.parquet(d).collect()
    }


def _write_fragmented(spark, sf_dir, dst, n_frags=40):
    ev = t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # one file per fragment — the streaming-sink pathology
    ev.repartition(n_frags).write.mode("overwrite").parquet(dst)
    assert len(_files(dst)) >= n_frags
    return ev


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    _write_fragmented(spark, sf_dir, src)
    n = compact_dataset(spark, src, dst, target_file_mb=64)
    assert len(_files(dst)) == n < len(_files(src))
    assert _rows(spark, dst) == _rows(spark, src)


def test_clustered_rewrite_tightens_footer_stats(spark, sf_dir, tmp_path):
    """After CLUSTER BY ts, each output file's (min ts, max ts) span must
    be a small slice of the global span — the property min/max pruning
    feeds on.  Checked against the actual parquet footers."""
    src, dst = str(tmp_path / "frag"), str(tmp_path / "clustered")
    _write_fragmented(spark, sf_dir, src)
    # force several output files so per-file ranges are meaningful
    compact_dataset(spark, src, dst, cluster_by=["ts"], n_files=8)
    files = _files(dst)
    assert len(files) >= 2
    spans, mins, maxs = [], [], []
    for f in files:
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(1).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(1).statistics.max
            for i in range(md.num_row_groups)
        )
        assert md.schema.column(1).name == "ts"
        spans.append((hi - lo).total_seconds())
        mins.append(lo)
        maxs.append(hi)
    global_span = (max(maxs) - min(mins)).total_seconds()
    # range partition on a ~uniform column: every file covers ~1/n of
    # the range; 2x headroom for boundary sampling slop
    assert all(s <= 2.0 * global_span / len(files) for s in spans), spans
    assert _rows(spark, dst) == _rows(spark, src)


def test_unclustered_rewrite_does_not_tighten_stats(spark, sf_dir, tmp_path):
    """Control: plain compaction leaves each file spanning ~the whole
    range (hash redistribution) — proving the cluster_by flag is what
    buys the skipping, not the rewrite itself."""
    src, dst = str(tmp_path / "frag"), str(tmp_path / "plain")
    _write_fragmented(spark, sf_dir, src)
    compact_dataset(spark, src, dst, n_files=8)
    files = _files(dst)
    assert len(files) >= 2
    md = pq.read_metadata(files[0])
    lo = md.row_group(0).column(1).statistics.min
    hi = md.row_group(0).column(1).statistics.max
    ev = spark.read.parquet(src).agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    global_span = (ev["hi"] - ev["lo"]).total_seconds()
    assert (hi - lo).total_seconds() > 0.5 * global_span


def test_in_place_swap_preserves_content(spark, sf_dir, tmp_path):
    d = str(tmp_path / "live")
    _write_fragmented(spark, sf_dir, d)
    before = _rows(spark, d)
    replace_dataset_in_place(spark, d, target_file_mb=64)
    assert _rows(spark, d) == before
    assert not os.path.exists(d + ".pre_compact")
    assert not os.path.exists(d + "._compacted")


def test_delete_keys_rewrites_only_affected_files(spark, sf_dir, tmp_path):
    import hashlib

    from go_pulsar_elasticsearch_spark.maintenance import delete_keys

    src, dst = str(tmp_path / "frag"), str(tmp_path / "byuser")
    _write_fragmented(spark, sf_dir, src)
    # cluster by the delete key so it localizes to ~one file
    compact_dataset(spark, src, dst, cluster_by=["user_id"], n_files=8)

    def digests():
        return {
            f: hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in _files(dst)
        }

    before_rows = _rows(spark, dst)
    before_digests = digests()
    target = 7  # present at every sf tier (user ids start at 0)
    expect_gone = {r for r in before_rows if r[2] == target}
    assert expect_gone

    stats = delete_keys(spark, dst, "user_id", [target])
    assert stats["rows_deleted"] == len(expect_gone)
    assert 1 <= stats["files_rewritten"] <= 2  # clustered: ~one file

    after_digests = digests()
    changed = {
        f for f in before_digests if after_digests.get(f) != before_digests[f]
    }
    assert len(changed) == stats["files_rewritten"]
    assert _rows(spark, dst) == before_rows - expect_gone
    # untouched files byte-identical, same file set (per-file os.replace)
    assert set(after_digests) == set(before_digests)


def test_delete_keys_preserves_null_keyed_rows(spark, sf_dir, tmp_path):
    """Round-4 ADVICE: ~isin(keys) is NULL for NULL keys under
    three-valued logic, so a naive filter(~hit) silently deletes every
    null-keyed row in a rewritten file."""
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.maintenance import delete_keys

    d = str(tmp_path / "withnulls")
    base = (
        spark.read.parquet(sf_dir + "/events.parquet")
        .select("event_id", "user_id", "event_type")
        .limit(500)
    )
    # null the key on a deterministic slice, co-resident with target rows
    nulled = base.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, F.lit(None)).otherwise(
            F.col("user_id")
        ),
    )
    nulled.coalesce(1).write.parquet(d)
    null_rows = spark.read.parquet(d).filter(F.col("user_id").isNull()).count()
    assert null_rows > 0
    target = [
        r["user_id"]
        for r in spark.read.parquet(d)
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .limit(1)
        .collect()
    ]
    expect_deleted = (
        spark.read.parquet(d).filter(F.col("user_id").isin(target)).count()
    )
    stats = delete_keys(spark, d, "user_id", target)
    assert stats["rows_deleted"] == expect_deleted
    after = spark.read.parquet(d)
    assert after.filter(F.col("user_id").isNull()).count() == null_rows
    assert after.filter(F.col("user_id").isin(target)).count() == 0


def test_delete_keys_missing_key_touches_nothing(spark, sf_dir, tmp_path):
    from go_pulsar_elasticsearch_spark.maintenance import delete_keys

    src, dst = str(tmp_path / "frag"), str(tmp_path / "byuser")
    _write_fragmented(spark, sf_dir, src)
    compact_dataset(spark, src, dst, cluster_by=["user_id"], n_files=4)
    before = _rows(spark, dst)
    stats = delete_keys(spark, dst, "user_id", [10**9])
    assert stats == {"files_rewritten": 0, "rows_deleted": 0}
    assert _rows(spark, dst) == before


def test_plan_file_count_scales_with_bytes(tmp_path):
    d = tmp_path / "sized"
    d.mkdir()
    for i in range(5):  # 5 x 64 MB of (sparse) parquet-named bytes
        with open(d / f"part-{i}.parquet", "wb") as fh:
            fh.truncate(64 * 1024 * 1024)
    (d / "_SUCCESS").touch()  # non-parquet files don't count
    assert plan_file_count(str(d), 128) == 3  # ceil(320/128)
    assert plan_file_count(str(d), 64) == 5
    assert plan_file_count(str(d), 10**6) == 1


# --------------------------------------------------------------------------
# manifest-pinned time travel (round-7 VERDICT #7)
# --------------------------------------------------------------------------


def test_time_travel_reproduces_every_state(spark, sf_dir, tmp_path):
    """write -> compact -> delete: each manifest stays readable and an
    as-of read reproduces that state's exact rows; published data
    files are never rewritten (byte-identity by immutability)."""
    import hashlib

    from go_pulsar_elasticsearch_spark.maintenance import (
        vt_compact,
        vt_current_version,
        vt_delete_keys,
        vt_history,
        vt_read,
        vt_write,
    )

    ds = str(tmp_path / "vt")
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n_all = ev.count()

    def state(v):
        return {tuple(r) for r in vt_read(spark, ds, as_of=v).collect()}

    def file_hashes(v):
        from go_pulsar_elasticsearch_spark.maintenance import vt_manifest

        out = {}
        for f in vt_manifest(ds, v)["files"]:
            with open(os.path.join(ds, f), "rb") as fh:
                out[f] = hashlib.sha256(fh.read()).hexdigest()
        return out

    assert vt_write(spark, ds, ev, n_files=6) == 0
    s0 = state(0)
    h0 = file_hashes(0)
    assert len(s0) == n_all

    # clustered compaction localizes each key range to one file — the
    # layout that lets the later delete carry untouched files
    assert vt_compact(spark, ds, n_files=2, cluster_by=["event_id"]) == 1
    s1 = state(1)
    assert s1 == s0  # compaction changes layout, never content

    lo = ev.agg(F.min("event_id")).first()[0]
    forget = [
        r.event_id for r in ev.filter(F.col("event_id") < lo + 30).collect()
    ]
    assert forget
    assert vt_delete_keys(spark, ds, "event_id", forget) == 2
    s2 = state(2)
    assert s2 == {r for r in s1 if r[0] not in set(forget)}

    # time travel: every prior state still reads back exactly, and the
    # files v0 pinned are byte-identical to what v0 published
    assert state(0) == s0 and state(1) == s1
    assert file_hashes(0) == h0
    assert vt_current_version(ds) == 2

    # audit log: ops, parentage, and the delete's accounting
    hist = vt_history(ds)
    assert [m["op"] for m in hist] == ["write", "compact", "delete"]
    assert [m["parent"] for m in hist] == [None, 0, 1]
    assert hist[2]["meta"]["rows_deleted"] == n_all - len(s2)
    # delete carried at least one untouched file by reference
    assert hist[2]["meta"]["files_carried"] >= 1
    carried = set(hist[1]["files"]) & set(hist[2]["files"])
    assert len(carried) == hist[2]["meta"]["files_carried"]


def test_time_travel_crash_safety_and_immutability(spark, sf_dir, tmp_path):
    """The _CURRENT pointer only ever moves after a complete manifest;
    a version can never be republished; reading a never-published
    version fails loudly."""
    import pytest

    from go_pulsar_elasticsearch_spark.maintenance import (
        _publish_version,
        vt_read,
        vt_write,
    )

    ds = str(tmp_path / "vt2")
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt_write(spark, ds, docs, n_files=2)
    with pytest.raises(FileExistsError):
        _publish_version(ds, 0, "write", [], {})
    with pytest.raises(FileNotFoundError):
        vt_read(spark, ds, as_of=7)


def test_vacuum_reclaims_only_unreferenced_files(spark, sf_dir, tmp_path):
    """vt_vacuum removes exactly the files no retained manifest
    references: reads at/above the retention floor are untouched,
    vacuumed as-of reads fail loudly, and the audit log survives."""
    import pytest

    from go_pulsar_elasticsearch_spark.maintenance import (
        vt_compact,
        vt_history,
        vt_manifest,
        vt_read,
        vt_vacuum,
        vt_write,
    )

    ds = str(tmp_path / "vtv")
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt_write(spark, ds, docs, n_files=3)
    vt_compact(spark, ds, n_files=2)   # v1: all-new files, v0's now dead
    s1 = {tuple(r) for r in vt_read(spark, ds, as_of=1).collect()}

    res = vt_vacuum(ds, retain_from=1)
    assert res["files_removed"] == len(vt_manifest(ds, 0)["files"])
    assert res["bytes_freed"] > 0
    # retained versions read back exactly; the floor version included
    assert {tuple(r) for r in vt_read(spark, ds, as_of=1).collect()} == s1
    # vacuumed as-of read fails loudly (files gone), history survives
    with pytest.raises(Exception):
        vt_read(spark, ds, as_of=0).collect()
    assert [m["op"] for m in vt_history(ds)] == ["write", "compact"]
    # idempotent: nothing left to reclaim
    assert vt_vacuum(ds, retain_from=1)["files_removed"] == 0


def test_streaming_sink_epochs_time_travel_and_replay(spark, sf_dir, tmp_path):
    """The manifest-pinned streaming sink: as-of version k equals the
    union of the first k+1 epochs, a replayed epoch publishes nothing,
    and the epoch audit trail is complete."""
    from go_pulsar_elasticsearch_spark.maintenance import (
        vt_current_version,
        vt_history,
        vt_read,
        vt_stream_epoch_append,
    )

    ds = str(tmp_path / "vts")
    ev = t(spark, sf_dir, "events").select("event_id", "user_id")
    batches = [
        ev.filter(F.col("event_id") % 3 == m) for m in range(3)
    ]
    for epoch, b in enumerate(batches):
        assert vt_stream_epoch_append(spark, ds, b, epoch) == epoch
    # replay every epoch: all no-ops, nothing double-appends
    for epoch, b in enumerate(batches):
        assert vt_stream_epoch_append(spark, ds, b, epoch) is None
    assert vt_current_version(ds) == 2

    def rows(v):
        return {tuple(r) for r in vt_read(spark, ds, as_of=v).collect()}

    want = set()
    for v, b in enumerate(batches):
        want |= {tuple(r) for r in b.collect()}
        assert rows(v) == want
    hist = vt_history(ds)
    assert [m["op"] for m in hist] == ["append"] * 3
    assert [m["meta"]["epoch"] for m in hist] == [0, 1, 2]
