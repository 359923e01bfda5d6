"""Streaming Bloom screen: the decontamination / seen-content filter
maintained live under foreachBatch — the fourth incremental monitor in
the family (near_dedup signatures, cms_monitor frequencies, lm_monitor
unigram counts), and the cleanest of them all, because Bloom state is
an idempotent monoid: OR is associative, commutative, AND idempotent.

Per micro-batch:
  1. the batch's documents explode to distinct word-5-grams with the
     SAME JVM xxhash64 pair as the certified batch operator
     (llm/decontamination.gram_hashes — shared code, so the monitor's
     partials can never drift from the batch Bloom);
  2. the hashes fold into one fixed-size partial bitmap
     (build_bloom_df) landing under ``epoch=<batch_id>`` with
     overwrite.

Reads OR-fold whatever epochs exist into one bitmap.  Because OR is
idempotent as well as associative, the convergence claim is stronger
than the CMS one: ANY epoch split of the corpus — including a replayed
epoch folded TWICE, or overlapping batches — yields the byte-identical
merged bitmap of the single-pass build.  tests/test_streaming_bloom.py
pins exactly that: merged streaming state == the batch operator's
bitmap byte-for-byte after the drain, unchanged by epoch replay, and
the candidates probed against the live bitmap feed the same exact
verify join to reproduce ``decontam_ngram_overlap``.

Replay safety: epoch writes are overwrites keyed by batch id and reads
are pure folds, so a checkpoint replay rewrites the same bytes — and
even if it DIDN'T overwrite (duplicate epoch rows), idempotent OR
makes the merged state identical anyway.

Scale posture: state is |epochs| fixed 1 MiB bitmaps regardless of
stream length; ``compact_store`` folds old epochs into one baseline
bitmap (same two-phase scratch+marker protocol as cms_monitor), so the
store stays O(recent epochs).  This is how a crawl frontier keeps its
"content seen?" screen current while 1000 executors keep fetching.

Reference parity: the reference dedupes by last-write-wins doc id at
the sink (es.go:186); this is the corpus-scale generalization the
north-star pipeline needs on the INGEST side.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from go_pulsar_elasticsearch_spark.llm.decontamination import (
    _BLOOM_M,
    build_bloom_df,
    gram_hashes,
    or_merge_blooms,
)
from go_pulsar_elasticsearch_spark.streaming.store import read_store_or_empty

_STORE_SCHEMA = "bloom binary, epoch long"


def write_epoch(batch_df: DataFrame, store_path: str, epoch_id: int) -> None:
    """foreachBatch body: fold this batch's documents into one partial
    bitmap under its epoch (idempotent overwrite)."""
    build_bloom_df(gram_hashes(batch_df, split=False)).write.mode(
        "overwrite"
    ).parquet(f"{store_path}/epoch={epoch_id}")


def merged_bloom_df(
    spark: SparkSession, store_path: str, below_epoch: int | None = None
) -> DataFrame:
    """One-row 'bloom binary' frame OR-folding the stored epochs —
    optionally only epochs strictly below ``below_epoch`` (the
    replay-safe mid-stream read)."""
    st = read_store_or_empty(spark, store_path, _STORE_SCHEMA)
    if below_epoch is not None:
        st = st.filter(st["epoch"] < below_epoch)
    return or_merge_blooms(st.select("bloom"))


def merged_bloom_bytes(
    spark: SparkSession, store_path: str, below_epoch: int | None = None
) -> bytes:
    """The merged bitmap itself (fixed m/8 bytes — bounded driver
    state, same class as the batch operator's collect)."""
    rows = merged_bloom_df(spark, store_path, below_epoch).collect()
    if not rows:
        return bytes(_BLOOM_M // 8)
    return bytes(rows[0]["bloom"])


def compact_store(spark: SparkSession, store_path: str, below_epoch: int) -> int:
    """Fold epochs strictly below ``below_epoch`` into ONE baseline
    bitmap under the newest folded epoch id.  Same two-phase crash-safe
    protocol as cms_monitor.compact_store (scratch dir + completion
    marker + resume); idempotent OR additionally makes even a DOUBLE
    fold harmless.  Returns the number of epochs folded (0 = nothing
    to do)."""
    st = read_store_or_empty(spark, store_path, _STORE_SCHEMA)
    epochs = sorted(
        r["epoch"] for r in st.select("epoch").distinct().collect()
    )
    folded = [e for e in epochs if e < below_epoch]
    if len(folded) < 2:
        return 0
    target = max(folded)
    scratch = os.path.join(store_path, "_compact_tmp")
    marker = os.path.join(store_path, "_compact_meta.json")

    def _resume() -> None:
        meta = json.load(open(marker))
        for e in meta["folded"]:
            d = os.path.join(store_path, f"epoch={e}")
            if os.path.isdir(d):
                shutil.rmtree(d)
        dest = os.path.join(store_path, f"epoch={meta['target']}")
        if os.path.isdir(scratch):
            if os.path.isdir(dest):
                shutil.rmtree(scratch)
            else:
                os.rename(scratch, dest)
        os.remove(marker)

    if os.path.exists(marker):
        _resume()
        return 0

    baseline = or_merge_blooms(
        st.filter(st["epoch"] < below_epoch).select("bloom")
    )
    if os.path.isdir(scratch):
        shutil.rmtree(scratch)
    baseline.write.mode("overwrite").parquet(scratch)
    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as f:
        json.dump({"folded": folded, "target": target}, f)
    os.replace(tmp_marker, marker)  # publish: scratch is complete
    _resume()
    return len(folded)


def run_bloom_monitor(
    spark: SparkSession, src_path: str, store_path: str, checkpoint: str
) -> None:
    """Drive the monitor over a parquet-file stream of (doc_id, text)
    rows, one micro-batch per file, draining everything (the shared
    fixture's bounded availableNow drain — streaming/drain.py)."""
    from go_pulsar_elasticsearch_spark.streaming.drain import drain_stream

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    drain_stream(
        stream,
        lambda df, eid: write_epoch(df, store_path, epoch_id=eid),
        checkpoint,
    )
