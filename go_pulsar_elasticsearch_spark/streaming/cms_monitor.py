"""Streaming frequency monitor: the batch ``agg_count_min`` sketch
maintained incrementally under foreachBatch — a live "how often has key
X occurred per group so far" service (rate limiting, trending probes,
abuse counters) with fixed-size state.

Per micro-batch:
  1. one JVM ``count_min_sketch`` aggregate per event_type over the
     batch's rows (whole-stage, map-side combined — the identical
     literals as the certified batch operator, so every partial shares
     the same hashA coefficients);
  2. the per-type batch sketches land under ``epoch=<batch_id>``
     directories written with overwrite.

Reads merge the stored epoch sketches per type in executor-side Python
(functions/cms.py): element-wise table adds, so ANY epoch split of the
stream yields byte-identical merged state.  Convergence is pytest-pinned
in tests/test_streaming_cms.py: after the drain, the merged store equals
the single-pass whole-corpus sketch BIT-FOR-BIT (serialized bytes), not
just estimate-for-estimate.

Replay safety: the epoch write is an overwrite keyed by batch id, and
the merged read is pure (no read-modify-write on shared state), so a
checkpoint replay of a half-committed batch rewrites the same bytes —
the same contract as streaming/near_dedup.py and lm_monitor.py.

Scale posture: state is |types x epochs| fixed ~22 KB sketches —
independent of stream length; ``compact_store`` folds old epochs into
one baseline sketch per type under a two-phase crash-safe protocol
(scratch + marker + resume), keeping the store bounded by |types| no
matter how long the stream runs — byte-identical merged state before
and after, pytest-pinned including the mid-crash resume.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.functions import cms
from go_pulsar_elasticsearch_spark.streaming.store import read_store_or_empty

# the certified batch operator's literals, imported so the monitor's
# partials can never drift from it (different eps/conf/seed would make
# the sketches unmergeable — cms.merge raises)
from go_pulsar_elasticsearch_spark.operators.aggregates import (
    _CMS_CONF,
    _CMS_EPS,
    _CMS_SEED,
)

_STORE_SCHEMA = "event_type string, sk binary, epoch long"


def batch_sketches(batch_df: DataFrame) -> DataFrame:
    """(event_type, sk): one CMS per type over this batch's rows."""
    return batch_df.groupBy("event_type").agg(
        F.count_min_sketch(
            "user_id", F.lit(_CMS_EPS), F.lit(_CMS_CONF), F.lit(_CMS_SEED)
        ).alias("sk")
    )


def write_epoch(batch_df: DataFrame, store_path: str, epoch_id: int) -> None:
    """foreachBatch body: fold the batch into per-type sketches and
    land them under this epoch (idempotent overwrite)."""
    batch_sketches(batch_df).write.mode("overwrite").parquet(
        f"{store_path}/epoch={epoch_id}"
    )


def read_store(spark: SparkSession, store_path: str) -> DataFrame:
    return read_store_or_empty(spark, store_path, _STORE_SCHEMA)


def merged_sketches(
    spark: SparkSession, store_path: str, below_epoch: int | None = None
) -> DataFrame:
    """(event_type, sk, n_events): epoch sketches merged per type —
    optionally only epochs strictly below ``below_epoch`` (the
    replay-safe mid-stream read)."""
    st = read_store(spark, store_path)
    if below_epoch is not None:
        st = st.filter(F.col("epoch") < F.lit(below_epoch))

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = cms.merge([cms.parse(bytes(x)) for x in pdf["sk"]])
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "sk": [cms.serialize(merged)],
                "n_events": [merged.total],
            }
        )

    return st.groupBy("event_type").applyInPandas(
        _merge, "event_type string, sk binary, n_events long"
    )


def probe_estimates(merged: DataFrame, ids: list[int]) -> DataFrame:
    """(event_type, user_id, est_count, n_events) for fixed probe ids
    against a merged-sketch frame — the live lookup surface."""
    def _probe(pdf: pd.DataFrame) -> pd.DataFrame:
        s = cms.parse(bytes(pdf["sk"].iloc[0]))
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].iloc[0],
                "user_id": ids,
                "est_count": [cms.estimate_long(s, i) for i in ids],
                "n_events": int(pdf["n_events"].iloc[0]),
            }
        )

    return merged.groupBy("event_type").applyInPandas(
        _probe,
        "event_type string, user_id bigint, est_count bigint, n_events bigint",
    )


def compact_store(
    spark: SparkSession, store_path: str, below_epoch: int
) -> int:
    """Fold epochs strictly below ``below_epoch`` into ONE baseline
    sketch per type (merge associativity is the whole point of the
    state), so the store stays bounded by |types| + recent epochs no
    matter how long the stream runs.  The baseline lands under the
    NEWEST folded epoch id, so every read contract — including the
    strictly-prior replay read of epoch ``below_epoch`` — sees
    byte-identical merged state before and after.

    Two-phase protocol (a parquet dir can't atomically replace the
    epochs it is derived FROM):
      1. write the merged baseline into ``_compact_tmp`` — the
         underscore prefix keeps it invisible to every store read;
      2. atomically publish a ``_compact_meta.json`` marker NEXT TO
         (not inside) the scratch: the scratch is now COMPLETE;
      3. delete the folded epoch dirs;
      4. rename scratch -> ``epoch=<target>`` (the publish);
      5. remove the marker.
    The marker lives outside the scratch so it survives the rename:
    a crash before (2) is undone by re-running (unmarked scratch is
    junk; sources untouched); a crash anywhere after (2) is FINISHED
    by re-running — deletes are idempotent, and a marker with no
    scratch left means (4) already published, so resume just clears
    the marker.  Call compact_store again after any crash before
    trusting reads; it converges to the identical bytes either way.
    Returns the net number of epoch directories removed."""
    import json
    import os
    import shutil

    tmp = os.path.join(store_path, "_compact_tmp")
    meta_path = os.path.join(store_path, "_compact_meta.json")

    def _finish(meta: dict) -> int:
        for e in meta["folded"][:-1]:
            shutil.rmtree(f"{store_path}/epoch={e}", ignore_errors=True)
        target = f"{store_path}/epoch={meta['folded'][-1]}"
        if os.path.exists(tmp):
            shutil.rmtree(target, ignore_errors=True)
            os.rename(tmp, target)
        # else: a prior run already published the scratch as the
        # target (rename precedes marker removal), nothing to rename.
        os.remove(meta_path)
        return len(meta["folded"]) - 1

    if os.path.exists(meta_path):  # resume a crashed run
        with open(meta_path) as fh:
            return _finish(json.load(fh))
    if os.path.exists(tmp):  # crashed before the marker: scratch is junk
        shutil.rmtree(tmp)

    st = read_store(spark, store_path).filter(
        F.col("epoch") < F.lit(below_epoch)
    )
    epochs = sorted(
        r["epoch"] for r in st.select("epoch").distinct().collect()
    )
    if len(epochs) <= 1:
        return 0
    (
        merged_sketches(spark, store_path, below_epoch=below_epoch)
        .select("event_type", "sk")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # marker published via fsync + atomic rename so a torn write can
    # never be mistaken for a complete one on resume
    with open(meta_path + ".tmp", "w") as fh:
        json.dump({"folded": epochs}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(meta_path + ".tmp", meta_path)
    return _finish({"folded": epochs})


def run_cms_monitor(
    spark: SparkSession, src_path: str, store_path: str, checkpoint: str
) -> None:
    """Drive the monitor over a parquet-file stream of (event_type,
    user_id) rows, one micro-batch per file, draining everything."""
    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: write_epoch(df, store_path, epoch_id=eid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("cms monitor drain did not finish within 180s")
