"""Property-based tests (hypothesis) for the ingest-pipeline invariants —
the properties hold for ANY input, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.ingest.pipeline import (
    dlq_split,
    upsert_last_write_wins,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),          # key
        st.integers(min_value=0, max_value=10_000),    # ts millis
        st.integers(min_value=0, max_value=1_000_000), # unique-ish payload
    ),
    min_size=1,
    max_size=25,
)


@given(rows=rows_strategy)
@_SETTINGS
def test_upsert_keeps_exactly_one_row_per_key_and_it_is_maximal(spark, rows):
    df = spark.createDataFrame(rows, "uuid string, ts long, payload long")
    out = upsert_last_write_wins(df, ["uuid"], "ts", "payload").collect()
    # exactly one row per distinct key
    keys = [r["uuid"] for r in out]
    assert sorted(keys) == sorted({k for k, _, _ in rows})
    # the kept row is maximal under (ts, payload) for its key
    for r in out:
        candidates = [(t_, p) for k, t_, p in rows if k == r["uuid"]]
        assert (r["ts"], r["payload"]) == max(candidates)


@given(rows=rows_strategy, threshold=st.integers(min_value=0, max_value=10_000))
@_SETTINGS
def test_dlq_split_is_a_partition(spark, rows, threshold):
    df = spark.createDataFrame(rows, "uuid string, ts long, payload long")
    main_df, dlq_df = dlq_split(df, F.col("ts") >= threshold)
    n_main, n_dlq = main_df.count(), dlq_df.count()
    assert n_main + n_dlq == len(rows)
    assert all(r["ts"] >= threshold for r in main_df.collect())
    assert all(r["ts"] < threshold for r in dlq_df.collect())


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_decimal_sum_is_order_independent(spark, values):
    """The exactness core: dsum must not depend on row order/partitioning."""
    from go_pulsar_elasticsearch_spark.functions.exact import dsum

    df1 = spark.createDataFrame([(v,) for v in values], "x double").repartition(7)
    df2 = spark.createDataFrame([(v,) for v in reversed(values)], "x double").coalesce(1)
    s1 = df1.agg(dsum("x").alias("s")).collect()[0]["s"]
    s2 = df2.agg(dsum("x").alias("s")).collect()[0]["s"]
    assert s1 == s2  # bit-identical, not approx
