"""Round-7 ES parity additions: pipeline aggs part 2 (moving_fn /
serial_diff, bucket_script / selector / sort, auto_date_histogram),
metric aggs part 2 (string_stats, t_test, weighted_avg), and search
features (term suggester, rescore, search_after).

Oracle equivalence is certified by the registry sweep (all nine are
fully oracled); these tests pin the SEMANTIC invariants the hash match
alone would not explain — window placement, selector thresholds, ladder
minimality, statistical identities, and the ES ranking contracts.
"""

from __future__ import annotations

import math

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from go_pulsar_elasticsearch_spark.llm.search import (  # noqa: E402
    bm25_search,
)
from go_pulsar_elasticsearch_spark.llm.search_ext import (  # noqa: E402
    _RESCORE_QW,
    _RESCORE_RW,
    _RESCORE_SIZE,
    _RESCORE_WINDOW,
    _SA_CURSOR_RANK,
    _SA_PAGE,
    _SUGGEST_MAX_EDITS,
    _SUGGEST_SIZE,
    search_after_page,
    search_rescore,
    suggest_term_spellcheck,
)
from go_pulsar_elasticsearch_spark.operators.es_metric_aggs import (  # noqa: E402
    string_stats_agg,
    t_test_welch,
    weighted_avg_agg,
)
from go_pulsar_elasticsearch_spark.operators.es_pipeline_aggs import (  # noqa: E402
    _ADH_LADDER,
    _ADH_TARGET,
    _BS_SIZE,
    _BS_THRESHOLD,
    _MF_LAG,
    _MF_WINDOW,
    auto_date_histogram,
    pipeline_agg_bucket_script,
    pipeline_agg_moving_fn,
)

# --------------------------------------------------------------- pipeline


def test_moving_fn_window_placement(spark, sf_dir):
    """moving_fn (shift=0) averages the <=3 buckets strictly BEFORE the
    current one; serial_diff subtracts the bucket `lag` positions back."""
    rows = pipeline_agg_moving_fn(spark, sf_dir).collect()
    assert rows
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    for et, rs in series.items():
        rs.sort(key=lambda r: r.day)
        ns = [r.n for r in rs]
        for i, r in enumerate(rs):
            prev = ns[max(0, i - _MF_WINDOW):i]
            if not prev:
                assert r[f"mavg{_MF_WINDOW}"] is None
            else:
                assert math.isclose(
                    r[f"mavg{_MF_WINDOW}"], sum(prev) / len(prev)
                )
            want = None if i < _MF_LAG else ns[i] - ns[i - _MF_LAG]
            assert r[f"sdiff{_MF_LAG}"] == want


def test_bucket_script_selector_sort(spark, sf_dir):
    rows = pipeline_agg_bucket_script(spark, sf_dir).collect()
    assert 0 < len(rows) <= _BS_SIZE
    rates = [r.err_rate for r in rows]
    # selector: every surviving bucket is above threshold; script: the
    # rate is exactly the sibling-metric ratio; sort: rate DESC
    for r in rows:
        assert r.err_rate > _BS_THRESHOLD
        assert math.isclose(r.err_rate, r.n_error / r.n_total)
    assert rates == sorted(rates, reverse=True)


def test_auto_date_histogram_ladder_minimality(spark, sf_dir):
    rows = auto_date_histogram(spark, sf_dir).collect()
    assert rows
    w = rows[0].interval_s
    assert all(r.interval_s == w for r in rows)
    assert w in _ADH_LADDER
    assert len(rows) <= _ADH_TARGET
    # alignment + completeness: buckets are epoch-floored at w and the
    # histogram partitions every event
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert all(r.bucket_s % w == 0 for r in rows)
    assert sum(r.n for r in rows) == ev.count()
    # minimality: every smaller ladder width would overflow the target
    import datetime

    mn, mx = ev.selectExpr(
        "min(unix_timestamp(ts))", "max(unix_timestamp(ts))"
    ).first()
    for cand in _ADH_LADDER:
        if cand >= w:
            break
        assert (mx // cand) - (mn // cand) + 1 > _ADH_TARGET
    assert (mx // w) - (mn // w) + 1 <= _ADH_TARGET or w == _ADH_LADDER[-1]
    del datetime


# ----------------------------------------------------------------- metric


def test_string_stats_bounds(spark, sf_dir):
    rows = string_stats_agg(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.doc_count for r in rows) == docs.count()
    for r in rows:
        assert r.min_len <= r.avg_len <= r.max_len
        # the corpus alphabet is lowercase + space (<= 27 symbols), so
        # entropy in bits is bounded by log2(27); >0 because every
        # bucket mixes at least two characters
        assert 0.0 < r.entropy_bits <= math.log2(27) + 1e-9


def test_t_test_welch_matches_reference(spark, sf_dir):
    r = t_test_welch(spark, sf_dir).first()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = [x.value for x in ev.filter("event_type = 'purchase'").collect()]
    b = [x.value for x in ev.filter("event_type = 'error'").collect()]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    na, ma, va = mv(a)
    nb, mb, vb = mv(b)
    se_a, se_b = va / na, vb / nb
    t_ref = (ma - mb) / math.sqrt(se_a + se_b)
    df_ref = (se_a + se_b) ** 2 / (
        se_a**2 / (na - 1) + se_b**2 / (nb - 1)
    )
    assert (r.n_a, r.n_b) == (na, nb)
    assert math.isclose(r.t_stat, t_ref, rel_tol=1e-9)
    assert math.isclose(r.df_welch, df_ref, rel_tol=1e-9)
    # Welch df bracket: min(n)-1 <= df <= n_a + n_b - 2
    assert min(na, nb) - 1 <= r.df_welch <= na + nb - 2


def test_weighted_avg_in_range(spark, sf_dir):
    rows = weighted_avg_agg(spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo, hi = li.selectExpr(
        "min(l_extendedprice)", "max(l_extendedprice)"
    ).first()
    for r in rows:
        assert lo <= r.wavg_price <= hi


# ----------------------------------------------------------------- search


def test_suggester_contract(spark, sf_dir):
    rows = suggest_term_spellcheck(spark, sf_dir).collect()
    assert rows
    by_term: dict[str, list] = {}
    for r in rows:
        assert r.dist <= _SUGGEST_MAX_EDITS
        assert r.suggestion[0] == r.input_term[0]  # prefix_length=1
        assert 1 <= r.rk <= _SUGGEST_SIZE
        by_term.setdefault(r.input_term, []).append(r)
    for rs in by_term.values():
        rs.sort(key=lambda r: r.rk)
        keys = [(r.dist, -r.df, r.suggestion) for r in rs]
        assert keys == sorted(keys)
    # the planted typos hit their intended corrections first
    firsts = {t: rs[0].suggestion for t, rs in by_term.items()}
    assert firsts.get("sprak") == "spark"
    assert firsts.get("windoo") == "window"
    assert firsts.get("tabel") == "table"


def test_rescore_window_contract(spark, sf_dir, monkeypatch):
    res = search_rescore(spark, sf_dir).collect()
    assert 0 < len(res) <= _RESCORE_SIZE
    # the blend is exactly qw*bm25 + rw*coverage, ranked descending
    for r in res:
        assert math.isclose(
            r.score, _RESCORE_QW * r.bm25 + _RESCORE_RW * r.n_matched
        )
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)
    # the rescored hits' base scores agree with the certified base
    # ranking where they overlap (formula shared, not re-derived)
    base = {r.doc_id: r.score for r in bm25_search(spark, sf_dir).collect()}
    for r in res:
        if r.doc_id in base:
            assert math.isclose(r.bm25, base[r.doc_id])
    # WINDOW contract, made non-vacuous by shrinking the window below
    # the matched-doc count: only the base top-w may be rescored, so
    # with w=3 the result is exactly 3 rows and every returned doc's
    # base score is >= the highest base score EXCLUDED by the window
    import go_pulsar_elasticsearch_spark.llm.search_ext as se

    monkeypatch.setattr(se, "_RESCORE_WINDOW", 3)
    small = search_rescore(spark, sf_dir).collect()
    assert len(small) == 3
    small_ids = {r.doc_id for r in small}
    # expected window = base top-3 by (bm25 DESC, doc_id), built from
    # the same single-sourced scaffolding the op certifies with — this
    # pins the WINDOW WIRING (the oracle already pins the formula)
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.llm.search import (
        _QUERY_TERMS,
        bm25_base_frame,
        bm25_score_col,
        bm25_stats_frame,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = bm25_base_frame(docs, _QUERY_TERMS)
    stats = bm25_stats_frame(base, len(_QUERY_TERMS))
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(" OR ".join(f"tf{i} > 0" for i in range(len(_QUERY_TERMS))))
        .select(
            "doc_id",
            bm25_score_col(len(_QUERY_TERMS)).cast("double").alias("b"),
        )
    )
    want_ids = {
        r.doc_id
        for r in scored.orderBy(F.desc("b"), F.asc("doc_id")).limit(3).collect()
    }
    assert small_ids == want_ids


def test_search_after_equals_offset_page(spark, sf_dir):
    """The keyset page must equal ranks 21..30 of the global ordering —
    search_after is from+size's exact semantic, minus the skip scan."""
    page = search_after_page(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ordered = docs.orderBy(
        docs.n_chars.desc(), docs.doc_id.asc()
    ).collect()
    want = [
        (r.doc_id, r.n_chars)
        for r in ordered[_SA_CURSOR_RANK:_SA_CURSOR_RANK + _SA_PAGE]
    ]
    got = [(r.doc_id, r.n_chars) for r in page]
    assert got == want


# ------------------------------------------------- batch 2: DSL + buckets


def test_query_dsl_regexp_anchored(spark, sf_dir):
    """ES regexp is a WHOLE-TERM match: 'src[0-4]' must not match
    'src10' the way a substring rlike would."""
    from go_pulsar_elasticsearch_spark.llm.query_dsl import compile_query

    df = spark.createDataFrame(
        [("src1",), ("src10",), ("xsrc1",), ("src7",)], "source string"
    )
    got = {
        r.source
        for r in df.filter(
            compile_query({"regexp": {"source": "src[0-4]"}})
        ).collect()
    }
    assert got == {"src1"}


def test_query_dsl_minimum_should_counts(spark, sf_dir):
    """minimum_should_match=2 keeps exactly the docs satisfying >= 2
    should clauses (cross-checked by explicit recount)."""
    from go_pulsar_elasticsearch_spark.llm.query_dsl import (
        _DSL_MSM,
        query_dsl_minimum_should,
    )

    rows = query_dsl_minimum_should(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_id = {d.doc_id: d for d in docs}
    msm = _DSL_MSM["bool"]["minimum_should_match"]
    for r in rows:
        d = by_id[r.doc_id]
        toks = set(d.text.split(" "))
        n_sat = (
            ("spark" in toks)
            + ("window" in toks)
            + (d.lang == "en")
            + (d.n_chars >= 500)
        )
        assert n_sat >= msm
        assert d.doc_id not in (0, 1, 2)


def test_span_near_positions(spark, sf_dir):
    """Every reported pair count matches a Python recount of positions
    within slop; adjacency (phrase) pairs are a subset."""
    from go_pulsar_elasticsearch_spark.llm.search_ext import (
        _SPAN_SLOP,
        _SPAN_TERMS,
        span_near_query,
    )

    rows = {r.doc_id: r.n_pairs for r in span_near_query(spark, sf_dir).collect()}
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs:
        w = d.text.split(" ")
        p1 = [i for i, x in enumerate(w) if x == _SPAN_TERMS[0]]
        p2 = [i for i, x in enumerate(w) if x == _SPAN_TERMS[1]]
        n = sum(1 for x in p1 for y in p2 if abs(x - y) - 1 <= _SPAN_SLOP)
        if n > 0:
            assert rows.get(d.doc_id) == n
        else:
            assert d.doc_id not in rows


def test_filters_agg_partition_identity(spark, sf_dir):
    """other_bucket complements the UNION of the named filters (which
    may overlap): c_other == N - |short OR en_long|."""
    from go_pulsar_elasticsearch_spark.operators.es_bucket_aggs import (
        filters_agg,
    )

    rows = {r.bucket: r for r in filters_agg(spark, sf_dir).collect()}
    assert set(rows) == {"short", "en_long", "_other_"}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    n_union = docs.filter(
        "n_chars < 300 OR (lang = 'en' AND n_chars >= 700)"
    ).count()
    assert rows["_other_"].doc_count == n - n_union
    assert rows["short"].doc_count == docs.filter("n_chars < 300").count()


def test_diversified_sampler_caps(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.operators.es_bucket_aggs import (
        _DS_MAX_PER_VALUE,
        _DS_SHARD_SIZE,
        sampler_diversified_agg,
    )

    rows = sampler_diversified_agg(spark, sf_dir).collect()
    assert 0 < len(rows) <= _DS_SHARD_SIZE
    per_src: dict[str, int] = {}
    for r in rows:
        per_src[r.source] = per_src.get(r.source, 0) + 1
        assert r.key_rk <= _DS_MAX_PER_VALUE
    assert all(c <= _DS_MAX_PER_VALUE for c in per_src.values())
    # sample is the TOP of the diversified pool: scores descend with rank
    rows.sort(key=lambda r: r.rk)
    chars = [r.n_chars for r in rows]
    assert chars == sorted(chars, reverse=True)


def test_geo_centroid_affine_identity(spark, sf_dir):
    """Integer-domain mean == mean of the per-point coordinates (affine
    map commutes with the mean, up to float tolerance)."""
    from go_pulsar_elasticsearch_spark.operators.geo import (
        _LAT_S,
        _LON_S,
        geo_centroid_agg,
    )
    from pyspark.sql import functions as F

    rows = {r.c_mktsegment: r for r in geo_centroid_agg(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    naive = {
        r.c_mktsegment: r
        for r in cust.select(
            "c_mktsegment",
            F.expr(_LAT_S).alias("lat"),
            F.expr(_LON_S).alias("lon"),
        )
        .groupBy("c_mktsegment")
        .agg(F.avg("lat").alias("la"), F.avg("lon").alias("lo"),
             F.count("*").alias("n"))
        .collect()
    }
    for seg, r in rows.items():
        assert r.point_count == naive[seg].n
        assert abs(r.centroid_lat - naive[seg].la) < 1e-9
        assert abs(r.centroid_lon - naive[seg].lo) < 1e-9
        assert -60 <= r.centroid_lat < 60 and -180 <= r.centroid_lon < 180


# -------------------------------------------------- batch 3: KN LM + hist


def test_kn_normalizes_per_context(spark, sf_dir):
    """Interpolated KN must distribute EXACTLY unit mass per context:
    sum over the full vocab of p(w2|w1) == 1 (discounted mass ==
    redistributed mass) — checked in Python from raw counts for the 3
    highest-volume contexts."""
    from collections import Counter

    from go_pulsar_elasticsearch_spark.llm.lm_score import (
        _KN_D,
        lm_kn_perplexity,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cb: Counter = Counter()
    for d in docs:
        w = [x for x in d.text.split(" ") if x]
        cb.update(zip(w, w[1:]))
    cf: Counter = Counter()
    t1: Counter = Counter()
    cont: Counter = Counter()
    for (w1, w2), c in cb.items():
        cf[w1] += c
        t1[w1] += 1
        cont[w2] += 1
    n_types = len(cb)
    vocab_cont = set(cont)
    for w1, _ in cf.most_common(3):
        total = 0.0
        for w2 in vocab_cont | {w for (a, w) in cb if a == w1}:
            c2 = cb.get((w1, w2), 0)
            p = (
                max(c2 - _KN_D, 0.0)
                + _KN_D * t1[w1] * (cont.get(w2, 0) / n_types)
            ) / cf[w1]
            total += p
        assert abs(total - 1.0) < 1e-9
    # and the registered op produces finite positive CE for every doc
    rows = lm_kn_perplexity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ce_kn > 0 and r.ce_kn == r.ce_kn  # finite, not NaN


def test_histogram_empty_buckets_lattice(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.operators.es_bucket_aggs import (
        _HIST_INTERVAL,
        _HIST_N,
        histogram_empty_buckets,
    )

    rows = sorted(
        histogram_empty_buckets(spark, sf_dir).collect(),
        key=lambda r: r.idx,
    )
    # the FULL lattice materializes, in order, zero-filled where empty
    assert [r.idx for r in rows] == list(range(_HIST_N + 1))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r.doc_count for r in rows) == ev.count()
    empties = [r for r in rows if r.doc_count == 0]
    assert empties, "bounds must extend past the data to exercise zero-fill"
    assert all(r.sum_value == 0.0 for r in empties)
    # spot-check one populated bucket against a direct filter count
    mid = next(r for r in rows if r.doc_count > 0)
    lo = mid.idx * _HIST_INTERVAL
    assert mid.doc_count == ev.filter(
        f"value >= {lo} AND value < {lo + _HIST_INTERVAL}"
    ).count()


def test_geo_distance_rings_partition(spark, sf_dir):
    """Rings partition the corpus (from-inclusive/to-exclusive) and each
    doc lands in the ring a Python recount of the shared metric picks."""
    from go_pulsar_elasticsearch_spark.operators.geo import (
        _LAT_S,
        _LON_S,
        _RINGS,
        _dist_expr,
        geo_distance_rings_agg,
    )
    from pyspark.sql import functions as F

    rows = {r.ring: r for r in geo_distance_rings_agg(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert sum(r.doc_count for r in rows.values()) == cust.count()
    dists = [
        r.d
        for r in cust.select(F.expr(_dist_expr(_LAT_S, _LON_S)).alias("d"))
        .collect()
    ]
    import bisect

    want: dict[str, int] = {}
    edges = list(_RINGS[1:])
    names = [f"{_RINGS[i]:g}-{_RINGS[i+1]:g}" for i in range(len(edges))]
    names.append(f"{_RINGS[-1]:g}-*")
    for d in dists:
        want_name = names[bisect.bisect_right(edges, d) if d not in edges
                          else edges.index(d) + 1]
        # bisect_right handles the from-inclusive edge exactly
        want[want_name] = want.get(want_name, 0) + 1
    for name, n in want.items():
        assert rows[name].doc_count == n


def test_terms_order_by_subagg_exact(spark, sf_dir):
    """Bucket selection is by the SUB-AGG value (avg_chars), not
    doc_count, and is globally exact."""
    from go_pulsar_elasticsearch_spark.operators.es_bucket_aggs import (
        _TOBS_SIZE,
        terms_order_by_subagg,
    )

    rows = terms_order_by_subagg(spark, sf_dir).collect()
    assert 0 < len(rows) <= _TOBS_SIZE
    avgs = [r.avg_chars for r in rows]
    assert avgs == sorted(avgs, reverse=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    agg: dict[str, list] = {}
    for d in docs:
        agg.setdefault(d.source, []).append(d.n_chars)
    best = sorted(
        ((sum(v) / len(v), k) for k, v in agg.items()),
        key=lambda t: (-t[0], t[1]),
    )[: len(rows)]
    assert [b[1] for b in best] == [r.source for r in rows]


def test_url_dedup_stream_converges_to_batch(spark, sf_dir):
    """The registered streaming twin returns exactly the batch keep-best
    rows, and a second invocation reuses the drained store (no second
    StreamingQuery)."""
    import go_pulsar_elasticsearch_spark.streaming.url_dedup as ud
    from go_pulsar_elasticsearch_spark.ingest.urlnorm import (
        url_canonical_dedup,
    )
    from go_pulsar_elasticsearch_spark.registry import QUERIES

    from go_pulsar_elasticsearch_spark.streaming import drain

    fn = QUERIES["url_canonical_dedup_stream"]
    got = {tuple(r) for r in fn(spark, sf_dir).collect()}
    want = {tuple(r) for r in url_canonical_dedup(spark, sf_dir).collect()}
    assert got == want
    key = ("url_stream", sf_dir)
    store_before = drain._DRAINED[key]
    fn(spark, sf_dir).collect()
    assert drain._DRAINED[key] is store_before  # drained once, reused
    del ud
    # the epoch FLIP the drivers are engineered for actually happened:
    # some canonical URL's winning (minimum) kept_doc_id lives in a
    # LATER epoch partial than the URL's first appearance — so the
    # merge genuinely re-decides winners instead of keeping first-seen
    import glob
    import os
    import re

    store = store_before
    by_url: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(glob.glob(os.path.join(store, "epoch=*"))):
        epoch = int(re.search(r"epoch=(\d+)", d).group(1))
        for r in spark.read.parquet(d).collect():
            by_url.setdefault(r.canonical_url, []).append(
                (epoch, r.kept_doc_id)
            )
    flips = 0
    for entries in by_url.values():
        if len(entries) < 2:
            continue
        first_epoch = min(e for e, _ in entries)
        win_epoch = min(entries, key=lambda t: t[1])[0]
        if win_epoch > first_epoch:
            flips += 1
    assert flips > 0, "no cross-epoch keep-best flip was exercised"


def test_msearch_shares_one_base_pass(spark, sf_dir):
    """Both _msearch sections read the slot-cached base projection
    (InMemoryTableScan in both branches), and each section equals its
    standalone recompute."""
    from go_pulsar_elasticsearch_spark.llm.query_dsl import msearch_fused
    from go_pulsar_elasticsearch_spark.plans.inspect import formatted_plan

    df = msearch_fused(spark, sf_dir)
    plan = formatted_plan(df)
    # formatted explain prints every operator TWICE (tree node +
    # details header), so one cached branch = 2 occurrences; BOTH
    # branches reading the cache = 4
    assert plan.count("InMemoryTableScan") >= 4
    rows = df.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r1 = {
        (r.source, r.cnt)
        for r in docs.filter("lang = 'en'")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    got_r1 = {(r.key, r.doc_count) for r in rows if r.request == "r1"}
    assert got_r1 == r1
    r2 = {
        (r.lang, r.cnt)
        for r in docs.filter("n_chars >= 500")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    got_r2 = {(r.key, r.doc_count) for r in rows if r.request == "r2"}
    assert got_r2 == r2
    assert all(r.avg_chars > 0 and r.doc_count > 0 for r in rows)


def test_termvectors_python_recount(spark, sf_dir):
    """tf / positions / corpus df recounted in Python for every
    returned (doc, term) row."""
    from collections import Counter

    from go_pulsar_elasticsearch_spark.llm.search_ext import (
        _TV_DOC_IDS,
        termvectors_doc,
    )

    rows = termvectors_doc(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    df_counter: Counter = Counter()
    ttf_counter: Counter = Counter()
    toks_by_doc = {}
    for d in docs:
        toks = [t for t in d.text.split(" ") if t]
        toks_by_doc[d.doc_id] = toks
        ttf_counter.update(toks)
        df_counter.update(set(toks))
    assert {r.doc_id for r in rows} <= set(_TV_DOC_IDS)
    for r in rows:
        toks = toks_by_doc[r.doc_id]
        want_pos = [str(i + 1) for i, t in enumerate(toks) if t == r.term]
        assert r.tf == len(want_pos) > 0
        assert r.positions == ",".join(want_pos)
        assert r.doc_freq == df_counter[r.term]
        assert r.ttf == ttf_counter[r.term]


def test_percentiles_bucket_recount(spark, sf_dir):
    """Recompute the daily histogram independently and check every
    emitted percentile is the nearest-rank (ceil) order statistic of
    that series' bucket values, with the census matching."""
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.operators.es_pipeline_aggs import (
        _PB_PERCENTS,
        percentiles_bucket,
    )

    rows = percentiles_bucket(spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .count()
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r["count"])
    got: dict[tuple, int] = {}
    for r in rows:
        assert r.percent in _PB_PERCENTS
        assert r.n_buckets == len(series[r.event_type])
        got[(r.event_type, r.percent)] = r.value
    # every (series, percent) pair is present exactly once, and the
    # value is sorted_values[ceil(p*n/100) - 1]
    for et, vals in series.items():
        vals.sort()
        n = len(vals)
        for p in _PB_PERCENTS:
            rank = (p * n + 99) // 100
            assert got[(et, p)] == vals[rank - 1], (et, p)
    assert len(got) == len(series) * len(_PB_PERCENTS) == len(rows)


def test_suggest_phrase_lm_recount(spark, sf_dir):
    """Recompute the Stupid-Backoff phrase scores in plain Python from
    the parquet and check the suggester's ranking matches; also pin
    that at least one candidate pair rides an ATTESTED bigram (score
    via c2/c1, not backoff), so the LM leg is exercised."""
    import math as m

    from go_pulsar_elasticsearch_spark.llm.search_ext import (
        _PHRASE_INPUT,
        _PHRASE_SIZE,
        _SB_ALPHA,
        _SUGGEST_MAX_EDITS,
        suggest_phrase,
    )

    rows = suggest_phrase(spark, sf_dir).collect()
    assert rows and len(rows) <= _PHRASE_SIZE

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    n_tok = 0
    for r in docs:
        w = [x for x in r.text.split(" ") if x]
        n_tok += len(w)
        for tok in w:
            uni[tok] = uni.get(tok, 0) + 1
        for a, b in zip(w, w[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def cands(term):
        return {
            v: lev(term, v) for v in uni
            if v[0] == term[0] and lev(term, v) <= _SUGGEST_MAX_EDITS
        }

    c1s, c2s = cands(_PHRASE_INPUT[0]), cands(_PHRASE_INPUT[1])
    assert len(c1s) >= 2 and len(c2s) >= 2  # genuinely ambiguous inputs
    expect = {}
    any_attested = False
    for t1 in c1s:
        for t2 in c2s:
            if (t1, t2) in bi:
                s2 = bi[(t1, t2)] / uni[t1]
                any_attested = True
            else:
                s2 = _SB_ALPHA * uni[t2] / n_tok
            expect[f"{t1} {t2}"] = (
                round(m.log(uni[t1] / n_tok), 6) + round(m.log(s2), 6)
            )
    assert any_attested
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    for rk, r in enumerate(sorted(rows, key=lambda r: r.rk), 1):
        assert r.rk == rk
        assert r.suggestion == want[rk - 1][0]
        assert m.isclose(r.score, want[rk - 1][1], rel_tol=1e-9)


def test_significant_text_recount(spark, sf_dir):
    """Recompute JLH from the span-deduplicated text (via the
    independently certified dup_span_remove transform) and check every
    emitted row; also pin the duplicate filter's effect: statistics
    must come from the CLEANED text, not the originals."""
    import math as m

    from go_pulsar_elasticsearch_spark.llm.dedup import dup_span_remove
    from go_pulsar_elasticsearch_spark.llm.hybrid import (
        _SIGTEXT_MIN_DF,
        _SIGTEXT_TERM,
        _SIGTEXT_TOPN,
        significant_text,
    )

    rows = significant_text(spark, sf_dir).collect()
    assert rows
    cleaned = {
        r.doc_id: r.cleaned_text
        for r in dup_span_remove(spark, sf_dir).collect()
    }
    orig = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    fg_ids = {d for d, t in orig.items() if _SIGTEXT_TERM in t.split(" ")}
    fg_n, bg_n = len(fg_ids), len(orig)
    fg_df: dict[str, int] = {}
    bg_df: dict[str, int] = {}
    for d, t in cleaned.items():
        for term in {x for x in t.split(" ") if x}:
            bg_df[term] = bg_df.get(term, 0) + 1
            if d in fg_ids:
                fg_df[term] = fg_df.get(term, 0) + 1
    scored = {}
    for term, bgd in bg_df.items():
        fgd = fg_df.get(term, 0)
        fgp, bgp = fgd / fg_n, bgd / bg_n
        if fgd >= _SIGTEXT_MIN_DF and fgp > bgp:
            scored[term] = round((fgp - bgp) * (fgp / bgp), 6)
    want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
    assert len(rows) == min(_SIGTEXT_TOPN, len(want))
    for r in sorted(rows, key=lambda r: r.rk):
        w_term, w_jlh = want[r.rk - 1]
        assert r.term == w_term
        assert m.isclose(r.jlh, w_jlh, rel_tol=1e-9)
        assert r.fg_df == fg_df.get(r.term, 0) and r.bg_df == bg_df[r.term]


def test_nested_vs_object_divergence(spark, sf_dir):
    """The fixture genuinely separates the two mappings: some events
    match under object flattening but NOT under nested per-element
    semantics (the classic false positive), and every nested match is
    an object match (nested is strictly stricter)."""
    from go_pulsar_elasticsearch_spark.operators.nested import (
        nested_vs_object_query,
    )

    rows = nested_vs_object_query(spark, sf_dir).collect()
    assert rows
    assert all(r.object_match for r in rows)
    false_pos = [r for r in rows if not r.nested_match]
    true_pos = [r for r in rows if r.nested_match]
    assert false_pos, "no cross-element false positives exercised"
    assert true_pos
    # recompute both verdicts from the generating arithmetic
    for r in rows:
        d = r.event_id
        has_p = d % 3 != 0
        p3 = has_p and d % 5 == 3
        q3 = d % 4 != 0 and d % 7 == 3
        assert r.nested_match == p3
        assert r.object_match == (has_p and (p3 or q3))
