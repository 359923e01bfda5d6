"""Round-8 ES parity additions, part 3: top_metrics, boxplot, rate,
variable_width_histogram, cumulative_cardinality, change_point,
categorize_text (operators/es_aggs2.py) and multi_match/intervals
(llm/search_ext2.py).

Oracle equivalence is certified by the registry sweep (all nine are
fully oracled); these tests pin the SEMANTIC invariants a hash match
alone would not explain — tie-break totality, bucket non-overlap,
cumulative monotonicity, the CUSUM recomputation, the dis_max blend,
and the ordered-interval reference semantics.
"""

from __future__ import annotations

import math

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from pyspark.sql import functions as F  # noqa: E402

from go_pulsar_elasticsearch_spark.catalog import t  # noqa: E402
from go_pulsar_elasticsearch_spark.llm.search_ext2 import (  # noqa: E402
    _IV_MAX_GAPS,
    _IV_TERMS,
    _MM_TIE,
    _MM_TOPN,
    intervals_ordered_query,
    multi_match_dismax,
)
from go_pulsar_elasticsearch_spark.operators.es_aggs2 import (  # noqa: E402
    _VWH_BUCKETS,
    boxplot_agg,
    categorize_text_agg,
    change_point_agg,
    cumulative_cardinality_agg,
    rate_agg,
    top_metrics_agg,
    variable_width_histogram_agg,
)

# ------------------------------------------------------------ top_metrics


def test_top_metrics_picks_max_sort_key_row(spark, sf_dir):
    """Per bucket, the reported metrics belong to the row with the
    lexicographically maximal (shipdate, price, orderkey) — re-derived
    row-by-row from the raw table."""
    got = {
        r["l_returnflag"]: r for r in top_metrics_agg(spark, sf_dir).collect()
    }
    raw = (
        t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_shipdate", "l_extendedprice", "l_orderkey")
        .collect()
    )
    best: dict = {}
    for r in raw:
        k = (r["l_shipdate"], r["l_extendedprice"], r["l_orderkey"])
        if r["l_returnflag"] not in best or k > best[r["l_returnflag"]]:
            best[r["l_returnflag"]] = k
    assert set(got) == set(best)
    for flag, (ts, price, key) in best.items():
        assert got[flag]["top_shipdate"] == ts
        assert got[flag]["top_price"] == price
        assert got[flag]["top_orderkey"] == key


# ----------------------------------------------------------------- boxplot


def test_boxplot_five_number_summary_is_ordered(spark, sf_dir):
    rows = boxplot_agg(spark, sf_dir).collect()
    assert rows
    total = sum(r["n"] for r in rows)
    assert total == t(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r["q_min"] <= r["q1"] <= r["q2"] <= r["q3"] <= r["q_max"]
        assert math.isclose(r["iqr"], r["q3"] - r["q1"], abs_tol=1e-12)


# -------------------------------------------------------------------- rate


def test_rate_agg_normalizes_per_hour(spark, sf_dir):
    rows = rate_agg(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert math.isclose(
            r["value_per_hour"] * 24, r["sum_value"], rel_tol=1e-12
        )
        assert math.isclose(r["events_per_hour"] * 24, r["n_events"])


# ----------------------------------------- variable_width_histogram


def test_vwh_buckets_partition_the_value_axis(spark, sf_dir):
    rows = sorted(
        variable_width_histogram_agg(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    ev = t(spark, sf_dir, "events")
    assert sum(r["n"] for r in rows) == ev.count()
    # buckets cover disjoint, ordered value ranges (equal-frequency
    # assignment by quantile boundaries can never interleave)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["v_max"] <= hi["v_min"]
        assert lo["bucket"] + 1 == hi["bucket"]
    # equal-frequency: no bucket is pathologically empty or dominant
    n_total = sum(r["n"] for r in rows)
    assert len(rows) == _VWH_BUCKETS
    for r in rows:
        assert r["n"] > 0
        assert r["n"] < n_total  # not everything in one bucket
        assert r["v_min"] <= r["v_mean"] <= r["v_max"]


# ------------------------------------------- cumulative_cardinality


def test_cumulative_cardinality_accumulates_first_seen(spark, sf_dir):
    rows = sorted(
        cumulative_cardinality_agg(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    ev = t(spark, sf_dir, "events")
    assert rows[-1]["cumulative_users"] == (
        ev.select("user_id").distinct().count()
    )
    run = 0
    for r in rows:
        assert 0 <= r["new_users"] <= r["daily_users"]
        run += r["new_users"]
        assert r["cumulative_users"] == run  # exact running total


def test_cumulative_cardinality_is_not_sum_of_dailies(spark, sf_dir):
    """The ES semantics pin: cumulative counts accumulated UNIQUES, so
    it must undercut the naive sum of daily cardinalities whenever any
    user is active on two days (true for this fixture)."""
    rows = cumulative_cardinality_agg(spark, sf_dir).collect()
    assert sum(r["daily_users"] for r in rows) > max(
        r["cumulative_users"] for r in rows
    )


# ------------------------------------------------------------ change_point


def test_change_point_matches_python_cusum(spark, sf_dir):
    """Recompute the CUSUM argmax from the daily sums in plain Python
    (decimal-rounded deviations, earliest-day tiebreak) and require the
    op to report exactly that day, statistic, and split means."""
    ev = t(spark, sf_dir, "events")
    daily = sorted(
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("x")
        )
        .collect(),
        key=lambda r: r["day"],
    )
    xs = [r["x"] for r in daily]
    mu = sum(xs) / len(xs)
    cs, run = [], 0.0
    for r in daily:
        run += round(r["x"] - mu, 4)
        run = round(run, 4)  # decimal accumulation stays on the grid
        cs.append((r["day"], run))
    # argmax |cusum|, earliest-day tiebreak (ORDER BY abs DESC, day ASC)
    best_abs = max(abs(c) for _, c in cs)
    best = next(p for p in cs if abs(p[1]) == best_abs)
    row = change_point_agg(spark, sf_dir).collect()[0]
    assert row["change_day"] == best[0]
    assert math.isclose(row["cusum"], best[1], abs_tol=1e-9)
    before = [r["x"] for r in daily if r["day"] <= best[0]]
    after = [r["x"] for r in daily if r["day"] > best[0]]
    assert math.isclose(
        row["mean_before"], sum(before) / len(before), rel_tol=1e-12
    )
    assert math.isclose(
        row["mean_after"], sum(after) / len(after), rel_tol=1e-12
    )


# -------------------------------------------------------- categorize_text


def test_categorize_text_collapses_to_templates(spark, sf_dir):
    rows = categorize_text_agg(spark, sf_dir).collect()
    ev = t(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    # one template per event type: user ids and props values normalize
    assert len(rows) == n_types
    assert sum(r["doc_count"] for r in rows) == ev.count()
    for r in rows:
        assert "#" in r["category"]
        assert not any(c.isdigit() for c in r["category"])


# --------------------------------------------------------- multi_match


def test_multi_match_blend_and_ranking(spark, sf_dir):
    rows = multi_match_dismax(spark, sf_dir).collect()
    assert 0 < len(rows) <= _MM_TOPN
    prev = None
    for r in sorted(rows, key=lambda r: r["rk"]):
        blend = max(r["score_title"], r["score_body"]) + _MM_TIE * min(
            r["score_title"], r["score_body"]
        )
        assert math.isclose(r["score"], blend, rel_tol=1e-12)
        if prev is not None:
            assert r["score"] <= prev + 1e-12  # rank follows score
        prev = r["score"]


def test_multi_match_title_field_is_prefix_scoped(spark, sf_dir):
    """A doc whose only term hits fall outside the first 8 tokens must
    score 0 on the title field — verified against the raw text."""
    rows = multi_match_dismax(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in rows]))
        .collect()
    }
    from go_pulsar_elasticsearch_spark.llm.search_ext2 import (
        _MM_TERMS,
        _MM_TITLE_TOKENS,
    )
    for r in rows:
        title = docs[r["doc_id"]].split(" ")[:_MM_TITLE_TOKENS]
        hits_in_title = any(t_ in title for t_ in _MM_TERMS)
        assert (r["score_title"] > 0) == hits_in_title


# ----------------------------------------------------------- intervals


def test_intervals_ordered_matches_python_reference(spark, sf_dir):
    """Full reference recompute over the corpus: ordered occurrence
    pairs with gap <= max_gaps, counting qualifying start positions
    and the tightest span width."""
    got = {
        r["doc_id"]: (r["n_spans"], r["tightest"])
        for r in intervals_ordered_query(spark, sf_dir).collect()
    }
    want = {}
    for r in t(spark, sf_dir, "documents").select("doc_id", "text").collect():
        w = r["text"].split(" ")
        p1 = [i + 1 for i, x in enumerate(w) if x == _IV_TERMS[0]]
        p2 = [i + 1 for i, x in enumerate(w) if x == _IV_TERMS[1]]
        spans = [
            min(y - x + 1 for y in p2 if y > x and y - x - 1 <= _IV_MAX_GAPS)
            for x in p1
            if any(y > x and y - x - 1 <= _IV_MAX_GAPS for y in p2)
        ]
        if spans:
            want[r["doc_id"]] = (len(spans), min(spans))
    assert got == want


def test_intervals_ordered_is_stricter_than_unordered(spark, sf_dir):
    """Ordering + the same gap budget can only shrink the unordered
    span_near candidate set computed at the same slop."""
    from go_pulsar_elasticsearch_spark.llm.search_ext import span_near_query

    ordered = {
        r["doc_id"] for r in intervals_ordered_query(spark, sf_dir).collect()
    }
    # span_near runs at slop=3 < max_gaps=4, so recompute unordered at 4
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    unordered = set()
    for r in docs:
        w = r["text"].split(" ")
        p1 = [i + 1 for i, x in enumerate(w) if x == _IV_TERMS[0]]
        p2 = [i + 1 for i, x in enumerate(w) if x == _IV_TERMS[1]]
        if any(
            abs(x - y) - 1 <= _IV_MAX_GAPS for x in p1 for y in p2
        ):
            unordered.add(r["doc_id"])
    assert ordered <= unordered
    assert span_near_query is not None  # imported sibling stays wired


# ------------------------------------------------- moving_percentiles


def test_moving_percentiles_match_python_recompute(spark, sf_dir):
    """Full-window-only semantics: every emitted row's p25/p50/p75 are
    the exact order statistics of the trailing 5 daily sums (positions
    1/2/3 of the sorted window — no interpolation at n=5)."""
    from go_pulsar_elasticsearch_spark.operators.es_pipeline_aggs import (
        _MP_WINDOW,
        moving_percentiles_agg,
    )

    daily = sorted(
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("x")
        )
        .collect(),
        key=lambda r: r["day"],
    )
    rows = {r["day"]: r for r in moving_percentiles_agg(spark, sf_dir).collect()}
    assert len(rows) == len(daily) - (_MP_WINDOW - 1)
    for i in range(_MP_WINDOW - 1, len(daily)):
        win = sorted(r["x"] for r in daily[i - _MP_WINDOW + 1 : i + 1])
        got = rows[daily[i]["day"]]
        assert math.isclose(got["mp25"], win[1], rel_tol=1e-12)
        assert math.isclose(got["mp50"], win[2], rel_tol=1e-12)
        assert math.isclose(got["mp75"], win[3], rel_tol=1e-12)


# ---------------------------------------------------- random_sampler


def test_random_sampler_estimates_and_determinism(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.operators.es_bucket_aggs import (
        _RS_DENOM,
        random_sampler_agg,
    )

    rows = random_sampler_agg(spark, sf_dir).collect()
    assert rows
    total_sampled = sum(r["n_sampled"] for r in rows)
    n_docs = t(spark, sf_dir, "documents").count()
    # the seeded hash draws ~1/4 of docs: generous 3-sigma-ish bounds
    frac = total_sampled / n_docs
    assert 0.15 < frac < 0.35
    for r in rows:
        assert r["est_n_docs"] == r["n_sampled"] * _RS_DENOM
    # deterministic: the sample is a pure function of (seed, doc_id)
    again = {r["source"]: r["n_sampled"] for r in random_sampler_agg(spark, sf_dir).collect()}
    assert again == {r["source"]: r["n_sampled"] for r in rows}


def test_random_sampler_estimate_tracks_truth(spark, sf_dir):
    """The scaled estimate lands near the true total (it's an unbiased
    estimator; at sf0.001's 500 docs allow a wide band)."""
    from go_pulsar_elasticsearch_spark.operators.es_bucket_aggs import (
        random_sampler_agg,
    )

    est = sum(
        r["est_n_docs"] for r in random_sampler_agg(spark, sf_dir).collect()
    )
    true = t(spark, sf_dir, "documents").count()
    assert 0.6 * true < est < 1.4 * true
