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


def test_pq_append_equals_one_shot_encode(spark):
    """Base-trained codebooks + delta append must reproduce one-shot
    encoding of the FULL corpus against the same frozen codebooks:
    deterministic per-vector encoding makes the probe bit-identical."""
    import pyspark.sql.functions as F

    from go_pulsar_elasticsearch_spark.catalog import t
    from go_pulsar_elasticsearch_spark.llm.similarity import (
        pq_codebook_array,
        pq_encode_df,
        pq_query_vectors,
        pq_search,
        pq_unit_vectors,
    )

    d = ann_index.index_dir("pq_base", _SF)
    shutil.rmtree(d, ignore_errors=True)
    appended = _rows(ann_index.ann_pq_append(spark, _SF))
    cb = pq_codebook_array(
        spark.read.parquet(os.path.join(d, "codebooks")).collect()
    )
    unit = pq_unit_vectors(t(spark, _SF, "embeddings"))
    one_shot = pq_search(
        pq_encode_df(unit, cb), unit, cb, *pq_query_vectors(unit)
    )
    assert appended == _rows(one_shot) and appended
    # the delta really carries the held-out quarter, nothing else
    delta = spark.read.parquet(os.path.join(d, "codes_delta_q4"))
    assert delta.filter(F.col("vec_id") % 4 != 3).count() == 0
    assert delta.count() > 0


def test_pq_append_is_idempotent_and_marker_gated(spark):
    """Repeat appends rewrite nothing; an unmarked delta (kill between
    parquet and marker) stays invisible to probes until re-appended."""
    d = ann_index.index_dir("pq_base", _SF)
    first = _rows(ann_index.ann_pq_append(spark, _SF))
    before = _mtimes(d)
    assert _rows(ann_index.ann_pq_append(spark, _SF)) == first
    assert _mtimes(d) == before, "repeat invocation rewrote artifacts"
    marker = os.path.join(d, "_APPENDED_q4")
    os.remove(marker)  # simulate the kill window
    base_only = ann_index._with_deltas(spark, d, "codes").count()
    healed = _rows(ann_index.ann_pq_append(spark, _SF))
    assert os.path.exists(marker) and healed == first
    merged = ann_index._with_deltas(spark, d, "codes")
    assert merged.count() > base_only
    assert merged.count() == merged.select("vec_id").distinct().count()


def test_pq_append_recall_vs_exact(spark):
    """The appended index keeps the family's recall@5 >= 0.9 bound vs
    the exact operator, with true cosines after re-rank."""
    import pytest as _pytest

    from go_pulsar_elasticsearch_spark.registry import QUERIES

    exact = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in QUERIES["similarity_topk"](spark, _SF).collect()
    }
    pq = {
        (r["qid"], r["vid"]): r["cosine"]
        for r in ann_index.ann_pq_append(spark, _SF).collect()
    }
    hits = set(exact) & set(pq)
    assert len(hits) / len(exact) >= 0.9
    for k in hits:
        assert pq[k] == _pytest.approx(exact[k], abs=1e-9), k
