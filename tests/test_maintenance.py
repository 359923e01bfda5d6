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
