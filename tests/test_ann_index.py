"""Persisted ANN index artifacts (round-5 VERDICT #2): train-once /
probe-many.  Stored-index probes must equal the in-memory twins
exactly, and a second probe must REUSE the artifacts (no rebuild)."""

from __future__ import annotations

import os
import shutil

from go_pulsar_elasticsearch_spark.llm import ann_index
from go_pulsar_elasticsearch_spark.llm.similarity import ann_ivf, ann_pq

_SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["qid"], r["rk"], r["vid"], round(r["cosine"], 12))
        for r in df.collect()
    )


def _mtimes(d: str) -> dict:
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


def test_ivf_stored_probe_equals_in_memory(spark):
    d = ann_index.index_dir("ivf", _SF)
    shutil.rmtree(d, ignore_errors=True)
    stored = _rows(ann_index.ann_ivf_stored(spark, _SF))
    fresh = _rows(ann_ivf(spark, _SF))
    assert stored == fresh and stored


def test_ivf_probe_many_never_rebuilds(spark):
    d = ann_index.index_dir("ivf", _SF)
    first = _rows(ann_index.ann_ivf_stored(spark, _SF))  # builds if absent
    before = _mtimes(d)
    assert before, "index artifacts missing"
    second = _rows(ann_index.ann_ivf_stored(spark, _SF))
    assert _mtimes(d) == before, "probe rebuilt the index"
    assert second == first


def test_pq_stored_probe_equals_in_memory(spark):
    d = ann_index.index_dir("pq", _SF)
    shutil.rmtree(d, ignore_errors=True)
    stored = _rows(ann_index.ann_pq_stored(spark, _SF))
    fresh = _rows(ann_pq(spark, _SF))
    # deterministic Lloyd init -> stored codebooks reproduce the fresh
    # fit bit-for-bit
    assert stored == fresh and stored


def test_pq_probe_many_never_rebuilds(spark):
    d = ann_index.index_dir("pq", _SF)
    first = _rows(ann_index.ann_pq_stored(spark, _SF))
    before = _mtimes(d)
    assert before, "index artifacts missing"
    second = _rows(ann_index.ann_pq_stored(spark, _SF))
    assert _mtimes(d) == before, "probe rebuilt the index"
    assert second == first


def test_half_built_index_is_rebuilt(spark):
    """A build killed before the marker publishes must be rebuilt, not
    half-read."""
    d = ann_index.index_dir("ivf", _SF)
    _rows(ann_index.ann_ivf_stored(spark, _SF))
    os.remove(ann_index._publish_marker(d))  # simulate a killed build
    got = _rows(ann_index.ann_ivf_stored(spark, _SF))
    assert os.path.exists(ann_index._publish_marker(d))
    assert got == _rows(ann_ivf(spark, _SF))


def test_ivf_append_equals_full_build(spark):
    """Base build (75%) + delta append reproduces the full-corpus
    result bit-for-bit (every centroid lives in the base slice)."""
    d = ann_index.index_dir("ivf_base", _SF)
    shutil.rmtree(d, ignore_errors=True)
    appended = _rows(ann_index.ann_ivf_append(spark, _SF))
    assert appended == _rows(ann_ivf(spark, _SF)) and appended


def test_ivf_append_is_idempotent(spark):
    """A second invocation must not double-insert the delta slice (the
    per-tag marker guards the append)."""
    d = ann_index.index_dir("ivf_base", _SF)
    first = _rows(ann_index.ann_ivf_append(spark, _SF))
    before = _mtimes(d)
    second = _rows(ann_index.ann_ivf_append(spark, _SF))
    assert second == first
    assert _mtimes(d) == before, "repeat invocation rewrote artifacts"
    # the assignment table holds every vector exactly once
    import os as _os

    assign = spark.read.parquet(_os.path.join(d, "assign"))
    assert assign.count() == assign.select("vec_id").distinct().count()


def test_half_appended_delta_is_invisible_then_healed(spark):
    """A kill after the delta parquet lands but before the marker must
    leave the delta INVISIBLE to probes; the rerun rewrites it whole
    (overwrite semantics — never a double-insert)."""
    d = ann_index.index_dir("ivf_base", _SF)
    shutil.rmtree(d, ignore_errors=True)
    full = _rows(ann_index.ann_ivf_append(spark, _SF))
    marker = os.path.join(d, "_APPENDED_q4")
    os.remove(marker)  # simulate the kill window
    # unmarked delta: probe sees base only (delta invisible, not half)
    from go_pulsar_elasticsearch_spark.llm.ann_index import _with_deltas

    base_only = _with_deltas(spark, d, "assign").count()
    healed = _rows(ann_index.ann_ivf_append(spark, _SF))  # re-append
    assert os.path.exists(marker)
    assert healed == full
    assign = spark.read.parquet(os.path.join(d, "assign"))
    merged = _with_deltas(spark, d, "assign")
    assert merged.count() == merged.select("vec_id").distinct().count()
    assert base_only == assign.count()  # the unmarked delta was hidden


def test_hyperparams_in_index_key():
    """Changing a quantizer knob must address a different artifact."""
    import go_pulsar_elasticsearch_spark.llm.similarity as sim

    d1 = ann_index.index_dir("ivf", _SF)
    old = sim._IVF_STEP
    sim._IVF_STEP = old * 2
    try:
        d2 = ann_index.index_dir("ivf", _SF)
    finally:
        sim._IVF_STEP = old
    assert d1 != d2
