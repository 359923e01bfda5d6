"""Table maintenance: small-file compaction with optional clustered
rewrite.

Streaming sinks (the engine's dated_partition_sink, the reference's
daily ES indices) produce one-file-per-micro-batch layouts; at 100 TB
that is millions of KB-sized files — scan planning cost, open-cost
floors, and dead scan parallelism (see catalog._repair_scan_parallelism
for the read-side symptom this write-side job cures at the source).

``compact_dataset`` rewrites a parquet directory into ~target-sized
files.  With ``cluster_by`` it range-partitions + sorts on the given
keys first — the OPTIMIZE ... ZORDER/CLUSTER BY shape — so each output
file covers a narrow key range and min/max row-group stats actually
prune (verified against parquet footer stats in
tests/test_maintenance.py, not just asserted in prose; the Morton-key
variant for multi-column skipping is the certified `zorder_layout`
operator, whose clustering key plugs straight into ``cluster_by``).

Safety: output lands in a fresh directory + atomic publish-by-rename —
the compaction never mutates the source in place, so a crash mid-write
leaves the live dataset untouched (write-then-delete, never
delete-then-write).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DEFAULT_TARGET_MB = 128


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def plan_file_count(src_dir: str, target_file_mb: int) -> int:
    """Output file count from the source's on-disk parquet bytes.
    Parquet-to-parquet compaction roughly preserves encoded size, so
    bytes/target is the right estimate without sampling rows."""
    return max(1, -(-_dir_bytes(src_dir) // (target_file_mb * 1024 * 1024)))


def compact_dataset(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = _DEFAULT_TARGET_MB,
    cluster_by: list[str] | None = None,
    n_files: int | None = None,
) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` as ~``target_file_mb`` files
    (or exactly ``n_files`` when given — e.g. to keep a minimum
    parallelism on small partitions); returns the output file count.

    cluster_by=None: pure compaction — repartition(n) moves each row
    once and writes n uniform files.  cluster_by=[cols]: range
    repartition + in-partition sort, so output file k holds the k-th
    key range and every file's min/max footer stats are tight (data
    skipping).  Both are one shuffle — at 100 TB this is the nightly
    maintenance job, parallel across the cluster, never through the
    driver."""
    n = n_files if n_files is not None else plan_file_count(
        src_dir, target_file_mb
    )
    df = spark.read.parquet(src_dir)
    if cluster_by:
        out = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n)
    tmp = dst_dir.rstrip("/") + "._compacting"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    # Spark's default timestamp encoding is legacy INT96, which carries
    # NO min/max footer stats — a clustered rewrite would then cluster
    # for nothing on time columns.  Write stats-bearing TIMESTAMP_MICROS
    # for the compacted layout (save/restore: this helper must not
    # change the session's behavior elsewhere).
    ts_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(ts_key, None)
    spark.conf.set(ts_key, "TIMESTAMP_MICROS")
    try:
        out.write.mode("overwrite").parquet(tmp)
    finally:
        if prev is None:
            spark.conf.unset(ts_key)
        else:
            spark.conf.set(ts_key, prev)
    # publish: rename is atomic on a POSIX dir; on object stores this
    # step becomes a manifest/metadata swap (Iceberg/Delta commit)
    if os.path.exists(dst_dir):
        shutil.rmtree(dst_dir)
    os.rename(tmp, dst_dir)
    return n


def delete_keys(
    spark: SparkSession,
    data_dir: str,
    key_col: str,
    keys: list,
) -> dict:
    """Targeted delete (right-to-be-forgotten): remove all rows whose
    ``key_col`` is in ``keys``, rewriting ONLY the files that contain a
    match — the other files are left byte-identical, so a petabyte
    dataset pays for the handful of files the key lives in (clustered
    layouts — see compact_dataset(cluster_by=[key]) — localize a key to
    ~one file; the affected-file probe is a pushed-predicate scan that
    prunes on exactly those footer stats).

    Per-file swap protocol: the filtered replacement is written to a
    scratch dir, then ``os.replace``d over the original path — atomic
    per file, and a crash at ANY point leaves the dataset readable:
    before the replace the original (pre-delete) file is intact and the
    job is retry-safe; there is never a moment with the file missing or
    half-written.  On an object store this becomes a manifest swap
    (Iceberg/Delta delete), same shape.

    Returns {"files_rewritten": n, "rows_deleted": n}.  The collect()
    is the affected-FILE list — bounded by the number of files the key
    touches, not by data size."""
    df = spark.read.parquet(data_dir)
    hit = F.col(key_col).isin(keys)
    # keep-predicate must be null-SAFE: ~isin(keys) is NULL (not true)
    # for a NULL key under three-valued logic, so filter(~hit) would
    # silently drop null-keyed rows from every rewritten file
    keep = F.col(key_col).isNull() | ~hit
    affected = [
        r["_f"]
        for r in df.filter(hit)
        .select(F.input_file_name().alias("_f"))
        .distinct()
        .collect()
    ]
    rewritten, deleted = 0, 0
    scratch = data_dir.rstrip("/") + "._deleting"
    for uri in affected:
        path = uri[len("file://"):] if uri.startswith("file://") else uri
        if os.path.exists(scratch):
            shutil.rmtree(scratch)
        part = spark.read.parquet(path)
        # hit is never TRUE for a NULL key (isin -> NULL under 3VL), so
        # this count is exact; only the KEEP predicate needed the
        # null-safe form — one count + one write per file, no re-read
        deleted += part.filter(hit).count()
        part.filter(keep).coalesce(1).write.mode("overwrite").parquet(scratch)
        new_part = [
            f for f in os.listdir(scratch) if f.endswith(".parquet")
        ][0]
        os.replace(os.path.join(scratch, new_part), path)
        # Hadoop's LocalFileSystem keeps a `.{name}.crc` sidecar; after
        # the byte swap the stale checksum would fail every later read
        crc = os.path.join(
            os.path.dirname(path), "." + os.path.basename(path) + ".crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        rewritten += 1
    if os.path.exists(scratch):
        shutil.rmtree(scratch)
    return {"files_rewritten": rewritten, "rows_deleted": deleted}


def replace_dataset_in_place(
    spark: SparkSession,
    data_dir: str,
    target_file_mb: int = _DEFAULT_TARGET_MB,
    cluster_by: list[str] | None = None,
) -> int:
    """In-place flavor: compact to a sibling dir, then swap — the old
    layout survives (as ``<dir>.pre_compact``) until the swap completes,
    write-then-delete ordering throughout."""
    compacted = data_dir.rstrip("/") + "._compacted"
    n = compact_dataset(spark, data_dir, compacted, target_file_mb, cluster_by)
    backup = data_dir.rstrip("/") + ".pre_compact"
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.rename(data_dir, backup)
    os.rename(compacted, data_dir)
    shutil.rmtree(backup)
    return n
