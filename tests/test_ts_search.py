"""ts_znorm_subsequence_topk: z-normalization must make the search
shape-invariant — an affine (a*x + b) copy of the anchor pattern is a
perfect match no matter the scale or offset."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from go_pulsar_elasticsearch_spark.operators.timeseries import (
    _TS_M,
    _TS_SQL,
)


@pytest.fixture()
def synthetic_events(spark):
    t0 = datetime(2026, 1, 1)
    pattern = [3.0, 7.0, 2.0, 9.0, 4.0, 8.0, 1.0, 6.0]
    assert len(pattern) == _TS_M
    rows = []
    eid = 0

    def emit(user, vals):
        nonlocal eid
        for i, v in enumerate(vals):
            rows.append((eid, user, t0 + timedelta(minutes=eid), float(v)))
            eid += 1

    emit(1, pattern)                      # anchor user (min user_id)
    emit(5, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0])  # flat: sd=0
    emit(7, [0.0, 0.0] + [2.5 * v - 4.0 for v in pattern] + [1.0, 2.0])
    emit(9, [5.0, 1.0, 8.0, 2.0, 9.0, 9.0, 2.0, 3.0, 4.0])     # unrelated
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    df.createOrReplaceTempView("events")
    yield
    spark.catalog.dropTempView("events")


def test_affine_copy_is_the_top_hit(spark, synthetic_events):
    out = spark.sql(_TS_SQL).collect()
    assert out, "search must return candidates"
    top = out[0]
    # user 7's affine copy ends at its 10th event (index 2+8 within its
    # run); find that event id: anchor used 8 events, user 5 used 8,
    # then user 7 events start at eid 16; the copy spans eids 18..25
    assert top.user_id == 7 and top.event_id == 25
    assert abs(top.zdist) < 1e-18, top.zdist
    # the flat window (sd = 0) must have been excluded, not div-by-zeroed
    assert all(r.user_id != 5 for r in out)
    # every distance is finite and sorted ascending
    dists = [r.zdist for r in out]
    assert dists == sorted(dists)
