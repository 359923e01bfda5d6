"""Count-min sketch interop (functions/cms.py + agg_count_min).

Certifies the Python parse/merge/probe of Spark's CountMinSketch
binaries against the JVM implementation itself, then the operator-level
claims: merging per-day partials reproduces the single-pass sketch
bit-for-bit, and estimates obey the CMS guarantee
``exact <= est <= exact + ceil(eps * total)``.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.functions import cms
from go_pulsar_elasticsearch_spark.operators.aggregates import (
    _CMS_CONF,
    _CMS_EPS,
    _CMS_PROBE_IDS,
    _CMS_SEED,
    agg_count_min,
)


def _jvm_cms(spark, depth, width, seed):
    return spark._jvm.org.apache.spark.util.sketch.CountMinSketch.create(
        depth, width, seed
    )


def test_python_estimates_match_jvm(spark):
    sk = _jvm_cms(spark, 5, 300, 42)
    rnd = random.Random(1)
    items = [rnd.randrange(-(2**40), 2**40) for _ in range(400)]
    for it in items:
        for _ in range(it % 7 + 1):
            sk.addLong(it)
    parsed = cms.parse(bytes(sk.toByteArray()))
    for it in items[:100]:
        assert cms.estimate_long(parsed, it) == sk.estimateCount(it)


def test_python_merge_matches_jvm_merge(spark):
    a, b = _jvm_cms(spark, 4, 200, 7), _jvm_cms(spark, 4, 200, 7)
    for i in range(500):
        a.addLong(i % 37)
        b.addLong(i % 53)
    pa, pb = cms.parse(bytes(a.toByteArray())), cms.parse(bytes(b.toByteArray()))
    a.mergeInPlace(b)
    assert cms.serialize(cms.merge([pa, pb])) == bytes(a.toByteArray())


def test_merge_rejects_mismatched_seeds(spark):
    a, b = _jvm_cms(spark, 4, 200, 7), _jvm_cms(spark, 4, 200, 8)
    pa, pb = cms.parse(bytes(a.toByteArray())), cms.parse(bytes(b.toByteArray()))
    with pytest.raises(ValueError):
        cms.merge([pa, pb])


def test_round_trip_serialization(spark):
    sk = _jvm_cms(spark, 3, 50, 42)
    for i in range(100):
        sk.addLong(i % 11)
    raw = bytes(sk.toByteArray())
    assert cms.serialize(cms.parse(raw)) == raw


def test_operator_merged_partials_equal_single_pass(spark, sf_dir):
    """The day-split partial sketches, merged in Python, must equal the
    sketch the JVM builds in ONE aggregation over the same rows — the
    mergeability claim, bit-for-bit per probed id."""
    from go_pulsar_elasticsearch_spark.catalog import t

    out = {
        (r["event_type"], r["user_id"]): (r["est_count"], r["n_events"])
        for r in agg_count_min(spark, sf_dir).collect()
    }
    single = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_min_sketch(
                "user_id",
                F.lit(_CMS_EPS),
                F.lit(_CMS_CONF),
                F.lit(_CMS_SEED),
            ).alias("sk"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(single) > 0
    for row in single:
        parsed = cms.parse(bytes(row["sk"]))
        assert parsed.total == row["n"]
        for pid in _CMS_PROBE_IDS:
            est, n_events = out[(row["event_type"], pid)]
            assert n_events == row["n"]
            assert est == cms.estimate_long(parsed, pid)


def test_operator_estimates_within_cms_bound(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.catalog import t

    exact = {
        (r["event_type"], r["user_id"]): r["c"]
        for r in (
            t(spark, sf_dir, "events")
            .filter(F.col("user_id").isin(list(_CMS_PROBE_IDS)))
            .groupBy("event_type", "user_id")
            .agg(F.count("*").alias("c"))
            .collect()
        )
    }
    rows = agg_count_min(spark, sf_dir).collect()
    assert rows
    for r in rows:
        lo = exact.get((r["event_type"], r["user_id"]), 0)
        hi = lo + math.ceil(_CMS_EPS * r["n_events"])
        assert lo <= r["est_count"] <= hi, (r, lo, hi)
