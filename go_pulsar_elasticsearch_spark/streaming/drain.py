"""Shared drain fixture for the streaming certification harnesses
(round-7 VERDICT #5).

Five registered queries certify live StreamingQuery behavior
(`crawl_corpus_stream`, `decontam_bloom_stream`,
`url_canonical_dedup_stream`, and the pulsar delivery pair); before
this module each rebuilt the same apparatus — ordered micro-batch
source, checkpoint dir, availableNow drain, per-(process, sf_dir)
memoization.  The apparatus now lives here ONCE:

  drained(key, build)        — run a drive exactly once per process and
                               reuse its result (train-once/probe-many,
                               the _LOOP_STATE pattern generalized);
  write_ordered_batches(...) — one parquet file per predicate with
                               strictly increasing mtimes, so
                               FileStreamSource (which orders pending
                               files by (mtime, path)) is guaranteed to
                               deliver micro-batches in write order —
                               epoch-flip coverage depends on it;
  drain_stream(...)          — foreachBatch + checkpoint + availableNow
                               + bounded awaitTermination;
  drain_file_stream(...)     — the whole fixture: tmpdir, ordered
                               source, drain; returns the base dir the
                               body wrote its stores under.

Consolidating the drains does NOT merge the certifications: each
registered query still drains its own source through its own store
protocol and is hash-checked by its own oracle — only the scaffolding
is shared.  Where semantics allow, one drained stream feeds multiple
stores (the crawl drain maintains the URL keep-best store, the raw
spool, AND the per-epoch source-stats partials that certify
`crawl_stats_stream`) — one drain, several certified readers.
"""

from __future__ import annotations

import glob
import os
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession

_DRAINED: dict[object, object] = {}


def drained(key: object, build: Callable[[], object]) -> object:
    """Run ``build`` once per process under ``key`` and memoize its
    result — later invocations (bench reps, repeated registry calls)
    reuse the drained state instead of re-draining."""
    if key not in _DRAINED:
        _DRAINED[key] = build()
    return _DRAINED[key]


def write_ordered_batches(
    df: DataFrame, src: str, predicates: list[Column]
) -> None:
    """Write one parquet file per predicate and stamp STRICTLY
    INCREASING mtimes so the file source delivers the micro-batches in
    exactly this order even when sequential writes land in one
    timestamp tick.

    The source is persisted across the per-predicate writes (r9,
    VERDICT item 3 / guide §5): each filtered write is an independent
    action, so without the persist the source lineage re-executed once
    PER PREDICATE — for the crawl drain that was three full scans of
    the Python WARC source just to spool three epochs.  One scan now
    materializes the frame; the filters read the cache."""
    stamped: set[str] = set()
    t0 = time.time()
    df = df.persist()
    try:
        for i, pred in enumerate(predicates):
            df.filter(pred).coalesce(1).write.mode("append").parquet(src)
            for f in glob.glob(os.path.join(src, "*.parquet")):
                if f not in stamped:
                    os.utime(f, (t0 + 10 * i, t0 + 10 * i))
                    stamped.add(f)
    finally:
        df.unpersist(blocking=False)


def id_range_predicates(col: Column, ranges) -> list[Column]:
    """[(lo, hi), ...] -> half-open range predicates on ``col``."""
    return [(col >= lo) & (col < hi) for lo, hi in ranges]


def drain_stream(
    source: DataFrame,
    body: Callable[[DataFrame, int], None],
    checkpoint: str,
    timeout_s: int = 180,
):
    """foreachBatch + checkpoint + availableNow, drained to completion
    (bounded wait — a wedged drain raises instead of hanging the
    harness).  Returns the terminated query."""
    q = (
        source.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"stream drain did not finish within {timeout_s}s")
    return q


def drain_file_stream(
    spark: SparkSession,
    df: DataFrame,
    schema: str,
    predicates: list[Column],
    body_factory: Callable[[str], Callable[[DataFrame, int], None]],
    prefix: str,
    timeout_s: int = 180,
) -> str:
    """The full fixture: materialize ``df`` as an ordered micro-batch
    file source, drain it through ``body_factory(base)`` one file per
    trigger, and return the base dir (the factory decides which store
    paths under it the body writes)."""
    base = tempfile.mkdtemp(prefix=prefix)
    src = os.path.join(base, "src")
    write_ordered_batches(df, src, predicates)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drain_stream(
        stream, body_factory(base), os.path.join(base, "ckpt"), timeout_s
    )
    return base
