"""Round-8 ES parity additions, part 4: match_phrase_prefix,
combined_fields, boosting, pinned, span_first_or (llm/search_ext3.py),
normalize / frequent_item_sets / bucket_correlation / scripted_metric
(operators/es_aggs3.py), geotile_grid (operators/geo.py), and
fim_transform (llm/corpus.py).

All eleven are fully oracled; these tests pin the SEMANTIC invariants a
hash match alone would not explain — phrase adjacency re-derived
row-by-row, the demotion factor, pinned ordering, per-series
normalization identities, support thresholds, the Pearson recompute,
Mercator tile fidelity vs true atanh(sin), and FIM's lossless
reassembly property.
"""

from __future__ import annotations

import math

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from pyspark.sql import functions as F  # noqa: E402

from go_pulsar_elasticsearch_spark.catalog import t  # noqa: E402
from go_pulsar_elasticsearch_spark.llm.corpus import (  # noqa: E402
    _FIM_MIN_CHARS,
    fim_transform,
)
from go_pulsar_elasticsearch_spark.llm.search_ext3 import (  # noqa: E402
    _BQ_NEG_BOOST,
    _BQ_NEGATIVE,
    _CF_TOPN,
    _MPP_FIRST,
    _MPP_PREFIX,
    _PIN_IDS,
    _SF_END,
    _SF_TERMS,
    boosting_query,
    combined_fields,
    match_phrase_prefix,
    pinned_query,
    span_first_or_query,
)
from go_pulsar_elasticsearch_spark.operators.es_aggs3 import (  # noqa: E402
    _FIS_MIN_SUPPORT,
    _SM_COHORTS,
    _SM_POSITIVE,
    bucket_correlation_agg,
    frequent_item_sets_agg,
    normalize_agg,
    scripted_metric_agg,
)
from go_pulsar_elasticsearch_spark.operators.geo import (  # noqa: E402
    _GT_ZOOM,
    geotile_grid_agg,
)


def _texts(spark, sf_dir):
    return {
        r["doc_id"]: r["text"]
        for r in t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }


# ---------------------------------------------------- match_phrase_prefix


def test_match_phrase_prefix_rederived(spark, sf_dir):
    """Every (n_phrases, first_pos) re-derived row-by-row in Python:
    '{first}' immediately followed by a '{prefix}%' token."""
    got = {
        r["doc_id"]: (r["n_phrases"], r["first_pos"])
        for r in match_phrase_prefix(spark, sf_dir).collect()
    }
    expect = {}
    for doc_id, text in _texts(spark, sf_dir).items():
        w = text.split(" ")
        hits = [
            j + 1
            for j in range(len(w) - 1)
            if w[j] == _MPP_FIRST and w[j + 1].startswith(_MPP_PREFIX)
        ]
        if hits:
            expect[doc_id] = (len(hits), min(hits))
    assert got == expect and got  # non-vacuous


# ------------------------------------------------------- combined_fields


def test_combined_fields_is_term_centric_not_dismax(spark, sf_dir):
    """The top-k is ranked by ONE combined-statistics score (strictly
    descending with doc_id tie-break), capped at k, and every returned
    doc matches at least one query term in the combined field."""
    rows = combined_fields(spark, sf_dir).collect()
    assert 0 < len(rows) <= _CF_TOPN
    ranked = sorted(rows, key=lambda r: r["rk"])
    for a, b in zip(ranked, ranked[1:]):
        assert (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])
        assert b["rk"] == a["rk"] + 1
    assert ranked[0]["rk"] == 1
    assert all(r["score"] > 0 for r in rows)


# -------------------------------------------------------- boosting_query


def test_boosting_demotes_by_exact_factor(spark, sf_dir):
    """A demoted doc's score is EXACTLY negative_boost times the score
    the same doc gets from the undemoted positive query — verified by
    recomputing the positive-only score via the shared scaffolding."""
    from go_pulsar_elasticsearch_spark.llm.search import (
        bm25_base_frame,
        bm25_score_col,
        bm25_stats_frame,
    )
    from go_pulsar_elasticsearch_spark.llm.search_ext3 import _BQ_TERMS

    docs = t(spark, sf_dir, "documents")
    base = bm25_base_frame(docs, _BQ_TERMS)
    stats = bm25_stats_frame(base, len(_BQ_TERMS))
    pure = {
        r["doc_id"]: float(r["s"])
        for r in base.crossJoin(F.broadcast(stats))
        .select("doc_id", bm25_score_col(len(_BQ_TERMS)).alias("s"))
        .collect()
    }
    texts = _texts(spark, sf_dir)
    rows = boosting_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        has_neg = _BQ_NEGATIVE in texts[r["doc_id"]].split(" ")
        assert r["demoted"] == int(has_neg)
        factor = _BQ_NEG_BOOST if has_neg else 1.0
        assert math.isclose(
            r["score"], pure[r["doc_id"]] * factor, rel_tol=1e-12
        )
    # Non-vacuity: demotion must CHANGE the ranking — some doc matching
    # both clauses would make the top-k on its undemoted score but is
    # (correctly) displaced by the negative_boost.  (At small SF no
    # demoted doc survives in the top-k at all, so "a demoted row is
    # present" would be the wrong invariant to pin.)
    returned = {r["doc_id"] for r in rows}
    floor = min(r["score"] for r in rows)
    displaced = [
        d for d, s in pure.items()
        if s > 0
        and _BQ_NEGATIVE in texts[d].split(" ")
        and s > floor
        and s * _BQ_NEG_BOOST < floor
    ]
    assert displaced
    assert not set(displaced) & returned


# ---------------------------------------------------------- pinned_query


def test_pinned_rank_first_in_given_order(spark, sf_dir):
    rows = sorted(pinned_query(spark, sf_dir).collect(), key=lambda r: r["rk"])
    pin = rows[: len(_PIN_IDS)]
    assert [r["doc_id"] for r in pin] == list(_PIN_IDS)
    assert all(r["src"] == "pinned" and r["score"] is None for r in pin)
    organic = rows[len(_PIN_IDS):]
    assert organic and all(r["src"] == "organic" for r in organic)
    assert not {r["doc_id"] for r in organic} & set(_PIN_IDS)
    scores = [r["score"] for r in organic]
    assert scores == sorted(scores, reverse=True)
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))


# --------------------------------------------------- span_first_or_query


def test_span_first_or_rederived(spark, sf_dir):
    got = {
        r["doc_id"]: (r["n_first_hits"], r["first_pos"])
        for r in span_first_or_query(spark, sf_dir).collect()
    }
    expect = {}
    for doc_id, text in _texts(spark, sf_dir).items():
        w = text.split(" ")[:_SF_END]
        hits = [j + 1 for j, tok in enumerate(w) if tok in _SF_TERMS]
        if hits:
            expect[doc_id] = (len(hits), min(hits))
    assert got == expect and got


# --------------------------------------------------------- normalize_agg


def test_normalize_identities_per_series(spark, sf_dir):
    """percent_of_sum sums to 1 per series; rescale_0_1 spans [0, 1]
    hitting both endpoints on any non-constant series; both re-derived
    from the bucket counts the op itself reports."""
    rows = normalize_agg(spark, sf_dir).collect()
    assert rows
    by_series: dict = {}
    for r in rows:
        by_series.setdefault(r["event_type"], []).append(r)
    for et, buckets in by_series.items():
        total = sum(b["n"] for b in buckets)
        assert math.isclose(sum(b["pct_of_sum"] for b in buckets), 1.0)
        lo = min(b["n"] for b in buckets)
        hi = max(b["n"] for b in buckets)
        for b in buckets:
            assert math.isclose(b["pct_of_sum"], b["n"] / total)
            if hi > lo:
                assert math.isclose(
                    b["rescaled_0_1"], (b["n"] - lo) / (hi - lo)
                )
            else:
                assert b["rescaled_0_1"] == 0.0
        if hi > lo:
            vals = [b["rescaled_0_1"] for b in buckets]
            assert math.isclose(min(vals), 0.0) and math.isclose(max(vals), 1.0)


# ----------------------------------------------- frequent_item_sets_agg


def test_frequent_item_sets_rederived(spark, sf_dir):
    """Pair supports re-derived from raw texts; threshold respected;
    pairs are ordered (a < b) and deduplicated."""
    texts = _texts(spark, sf_dir)
    n_docs = len(texts)
    from collections import Counter

    counts: Counter = Counter()
    for text in texts.values():
        items = sorted({w for w in text.split(" ") if w})
        for i, a in enumerate(items):
            for b in items[i + 1:]:
                counts[(a, b)] += 1
    expect = {
        pair: c for pair, c in counts.items()
        if c / n_docs >= _FIS_MIN_SUPPORT
    }
    rows = frequent_item_sets_agg(spark, sf_dir).collect()
    got = {(r["item_a"], r["item_b"]): r["doc_count"] for r in rows}
    assert len(got) == len(rows)  # no duplicate pairs
    assert got == expect and got
    for r in rows:
        assert r["item_a"] < r["item_b"]
        assert math.isclose(r["support"], r["doc_count"] / n_docs)


# ----------------------------------------------- bucket_correlation_agg


def test_bucket_correlation_matches_python_pearson(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("ts", "event_type").collect()
    from collections import defaultdict

    days: dict = defaultdict(lambda: [0, 0])
    for r in ev:
        k = r["ts"].date()
        days[k][0] += 1
        days[k][1] += int(r["event_type"] == "error")
    xs = [v[0] for v in days.values()]
    ys = [v[1] for v in days.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    expect = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = bucket_correlation_agg(spark, sf_dir).collect()[0]
    assert row["n_buckets"] == n
    assert math.isclose(row["correlation"], expect, rel_tol=1e-12)
    assert -1.0 <= row["correlation"] <= 1.0


# ------------------------------------------------- scripted_metric_agg


def test_scripted_metric_rederived(spark, sf_dir):
    """The signed sum re-derived per cohort with exact decimal cents —
    the map/combine/reduce result equals the sequential fold."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    from collections import defaultdict
    from decimal import Decimal

    acc: dict = defaultdict(lambda: [Decimal(0), 0])
    for r in ev:
        c = r["user_id"] % _SM_COHORTS
        cents = Decimal(str(r["value"])).quantize(Decimal("0.01"))
        acc[c][0] += cents if r["event_type"] in _SM_POSITIVE else -cents
        acc[c][1] += 1
    rows = scripted_metric_agg(spark, sf_dir).collect()
    assert len(rows) == len(acc)
    for r in rows:
        exp_sum, exp_n = acc[r["cohort"]]
        assert r["n_docs"] == exp_n
        assert math.isclose(r["signed_value"], float(exp_sum), abs_tol=1e-9)


# ------------------------------------------------------ geotile_grid_agg


def test_geotile_polynomial_tracks_true_mercator(spark, sf_dir):
    """Counts re-derived by recomputing every customer's tile with TRUE
    Mercator (math.atanh/sin): the fitted polynomial must agree on
    >= 99% of rows (disagreement only within the 5.2e-5 rad fit error
    of a tile boundary), and total counts must be conserved."""
    from go_pulsar_elasticsearch_spark.operators.geo import (
        _GT_LAT_S,
        _GT_LON_S,
    )

    cust = (
        t(spark, sf_dir, "customer")
        .select(
            F.expr(_GT_LAT_S).alias("lat"), F.expr(_GT_LON_S).alias("lon")
        )
        .collect()
    )
    n = 1 << _GT_ZOOM
    true_tiles = []
    for r in cust:
        tx = math.floor((r["lon"] + 180.0) / 360.0 * n)
        merc = math.atanh(math.sin(math.radians(r["lat"])))
        ty = math.floor((1.0 - merc / math.pi) / 2.0 * n)
        true_tiles.append(f"{_GT_ZOOM}/{tx}/{ty}")
    from collections import Counter

    expect = Counter(true_tiles)
    rows = geotile_grid_agg(spark, sf_dir).collect()
    got = {r["tile"]: r["n_customers"] for r in rows}
    assert sum(got.values()) == len(cust)  # conservation
    agree = sum(min(got.get(k, 0), v) for k, v in expect.items())
    assert agree / len(cust) >= 0.99
    for tile in got:
        z, tx, ty = tile.split("/")
        assert int(z) == _GT_ZOOM
        assert 0 <= int(tx) < n and 0 <= int(ty) < n


# -------------------------------------------------------- fim_transform


def test_fim_reassembly_is_lossless(spark, sf_dir):
    """Parsing the sentinels back out reconstructs the ORIGINAL text
    exactly for every doc, in both modes; the middle is never empty and
    always covers the doc's center third."""
    texts = _texts(spark, sf_dir)
    rows = fim_transform(spark, sf_dir).collect()
    eligible = {d for d, s in texts.items() if len(s) >= _FIM_MIN_CHARS}
    assert {r["doc_id"] for r in rows} == eligible and rows
    modes = set()
    for r in rows:
        s = r["fim_text"]
        assert r["mode"] == ("psm" if r["doc_id"] % 2 == 0 else "spm")
        modes.add(r["mode"])
        if r["mode"] == "psm":
            assert s.startswith("<PRE>")
            body = s[len("<PRE>"):]
            pre, rest = body.split("<SUF>", 1)
            suf, mid = rest.split("<MID>", 1)
        else:
            assert s.startswith("<SUF>")
            body = s[len("<SUF>"):]
            suf, rest = body.split("<PRE>", 1)
            pre, mid = rest.split("<MID>", 1)
        orig = texts[r["doc_id"]]
        assert pre + mid + suf == orig
        assert r["n_middle"] == len(mid) > 0
        assert r["n_chars_out"] == len(s)
        # p1 in the first third, p2 past the second third
        L = len(orig)
        assert len(pre) <= L // 3 + 1
        assert len(pre) + len(mid) >= (2 * L) // 3
    assert modes == {"psm", "spm"}


# ------------------------------------------------------- search_template


def test_search_template_rendering_and_filtering(spark, sf_dir):
    """The renderer handles {{var}} and {{#toJson}}; the executed result
    is re-derived row-by-row from the raw table with the params."""
    from go_pulsar_elasticsearch_spark.llm.search_template import (
        _ST_PARAMS,
        render_search_template,
        search_template,
    )

    rendered = render_search_template(
        '{"source": {"bool": {"must": [{"match": {"text": {{#toJson}}q{{/toJson}}}},'
        '{"range": {"n_chars": {"gte": {{min_chars}}}}}],'
        '"filter": [{"terms": {"source": {{#toJson}}sources{{/toJson}}}}]}}}',
        _ST_PARAMS,
    )
    assert rendered["bool"]["must"][0] == {"match": {"text": "merge batch"}}
    assert rendered["bool"]["must"][1] == {"range": {"n_chars": {"gte": 250}}}
    assert rendered["bool"]["filter"][0]["terms"]["source"] == _ST_PARAMS["sources"]

    rows = search_template(spark, sf_dir).collect()
    docs = t(spark, sf_dir, "documents").collect()
    expect = {
        r["doc_id"]
        for r in docs
        if "merge" in r["text"].split(" ")
        and "batch" in r["text"].split(" ")
        and r["n_chars"] >= 250
        and r["source"] in _ST_PARAMS["sources"]
    }
    assert {r["doc_id"] for r in rows} == expect and rows


# ---------------------------------------------------- terms_lookup_query


def test_terms_lookup_rederived(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.llm.search_template import (
        _TL_LOOKUP_DOC,
        terms_lookup_query,
    )

    texts = _texts(spark, sf_dir)
    vocab = {w for w in texts[_TL_LOOKUP_DOC].split(" ") if w}
    expect = {}
    for doc_id, text in texts.items():
        if doc_id == _TL_LOOKUP_DOC:
            continue
        shared = len({w for w in text.split(" ")} & vocab)
        if shared:
            expect[doc_id] = shared
    got = {
        r["doc_id"]: r["n_shared_terms"]
        for r in terms_lookup_query(spark, sf_dir).collect()
    }
    assert got == expect and got


# --------------------------------------------------------- rank_eval_api


def test_rank_eval_metrics_rederived(spark, sf_dir):
    """precision@k / recall@k / MRR re-derived from an independent
    Python ranking built on the certified per-term BM25 scores."""
    from go_pulsar_elasticsearch_spark.llm.search import (
        _bm25_contrib,
        bm25_base_frame,
        bm25_stats_frame,
    )
    from go_pulsar_elasticsearch_spark.llm.search_template import (
        _RE_K,
        _RE_QUERIES,
        rank_eval_api,
    )

    docs = t(spark, sf_dir, "documents")
    base = bm25_base_frame(docs, _RE_QUERIES)
    stats = bm25_stats_frame(base, len(_RE_QUERIES))
    joined = base.crossJoin(F.broadcast(stats))
    per_q = {}
    total_at_k = 0
    for q in range(len(_RE_QUERIES)):
        scored = [
            (r["s"], r["doc_id"])
            for r in joined.filter(F.col(f"tf{q}") > 0)
            .select("doc_id", _bm25_contrib(q).cast("double").alias("s"))
            .collect()
        ]
        ranked = sorted(scored, key=lambda p: (-p[0], p[1]))
        rels = [int((d + q) % 3 > 0) for _, d in ranked]
        n_at_k = sum(rels[:_RE_K])
        total_at_k += n_at_k
        first = next((i + 1 for i, r in enumerate(rels) if r), None)
        per_q[q] = (
            n_at_k / _RE_K,
            n_at_k / sum(rels),
            round(1.0 / first, 6) if first else 0.0,
        )
    rows = rank_eval_api(spark, sf_dir).collect()
    assert len(rows) == len(_RE_QUERIES)
    mean_expect = total_at_k / (_RE_K * len(_RE_QUERIES))
    for r in rows:
        p, rec, mrr = per_q[r["qid"]]
        assert math.isclose(r["precision_at_k"], p)
        assert math.isclose(r["recall_at_k"], rec)
        assert math.isclose(r["mrr"], mrr)
        assert math.isclose(r["mean_precision"], mean_expect)
    # non-vacuity: metrics must not be degenerate across the board
    assert any(0 < r["precision_at_k"] < 1 for r in rows)


# ------------------------------------------------- pack_sequences_bestfit


def _py_bfd(items, budget):
    """Independent best-fit-decreasing reference, written with a
    DIFFERENT mechanism than the operator (which scans loads and takes
    max by (load, -index)): here bins are chosen by sorting the open
    bins by (remaining capacity ASC, index ASC) and taking the first
    that fits — the textbook best-fit statement.  Equivalent semantics
    through different control flow, so a shared-logic bug cannot be
    self-confirming."""
    loads, counts = [], []
    for tok, _doc in sorted(items, key=lambda p: (-p[0], p[1])):
        placed = False
        for i in sorted(range(len(loads)),
                        key=lambda i: (budget - loads[i], i)):
            if budget - loads[i] >= tok:
                loads[i] += tok
                counts[i] += 1
                placed = True
                break
        if not placed:
            loads.append(tok)
            counts.append(1)
    return loads, counts


def test_pack_bestfit_bin_for_bin_vs_reference(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.llm.corpus import (
        _BF_BUDGET,
        _BF_SHARD_DOCS,
        pack_sequences_bestfit,
    )
    from go_pulsar_elasticsearch_spark.llm.text_analysis import _BPE_RE

    toks = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
            ).alias("n"),
        )
        .collect()
    )
    shards: dict = {}
    for r in toks:
        shards.setdefault(r["doc_id"] // _BF_SHARD_DOCS, []).append(
            (r["n"], r["doc_id"])
        )
    rows = pack_sequences_bestfit(spark, sf_dir).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["shard"], []).append(r)
    assert set(got) == set(shards)
    for shard, items in shards.items():
        loads, counts = _py_bfd(items, _BF_BUDGET)
        bins = sorted(got[shard], key=lambda r: r["bin_id"])
        assert [r["bin_tokens"] for r in bins] == loads
        assert [r["n_docs"] for r in bins] == counts
        # invariants: conservation, no silent overflow, BFD half-full
        # guarantee (at most one bin at-or-under half, unless oversized
        # singletons are involved)
        assert sum(loads) == sum(n for n, _ in items)
        for r in bins:
            assert r["oversized"] == int(r["bin_tokens"] > _BF_BUDGET)
            if r["oversized"]:
                assert r["n_docs"] == 1  # only a single doc may overflow
            assert math.isclose(
                r["fill_ratio"], r["bin_tokens"] / _BF_BUDGET
            )
        under_half = [
            r for r in bins
            if not r["oversized"] and 2 * r["bin_tokens"] <= _BF_BUDGET
        ]
        assert len(under_half) <= 1


# ------------------------------------------------------- has_child_query


def test_has_child_rederived(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.operators.nested import (
        _HC_MIN,
        _HC_QTY,
        has_child_query,
    )

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).collect()
    from collections import defaultdict

    acc: dict = defaultdict(lambda: [0, 0, 0])
    for r in li:
        q = int(r["l_quantity"])
        if q >= _HC_QTY:
            a = acc[r["l_orderkey"]]
            a[0] += 1
            a[1] += q
            a[2] = max(a[2], q)
    status = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .collect()
    }
    expect = {
        k: (v[0], v[1], v[2], status[k])
        for k, v in acc.items()
        if v[0] >= _HC_MIN and k in status
    }
    rows = has_child_query(spark, sf_dir).collect()
    got = {
        r["o_orderkey"]: (
            r["n_children"], r["score_sum"], r["score_max"],
            r["o_orderstatus"],
        )
        for r in rows
    }
    assert got == expect and got


# ----------------------------------------------------- geo_shape_polygon


def test_geo_shape_matches_winding_number(spark, sf_dir):
    """Containment re-derived with an INDEPENDENT algorithm (winding
    number via atan2 angle summation) — must agree with the op's ray
    casting on every customer; plus the even-odd nonconvexity
    sanity: the polygon band contains some and excludes some."""
    from go_pulsar_elasticsearch_spark.operators.geo import (
        _GS_LAT_S,
        _GS_LON_S,
        _GS_POLY,
        geo_shape_polygon,
    )

    pts = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.expr(_GS_LAT_S).alias("lat"),
            F.expr(_GS_LON_S).alias("lon"),
        )
        .collect()
    )
    def winding(px, py):
        total = 0.0
        n = len(_GS_POLY)
        for i in range(n):
            x1, y1 = _GS_POLY[i]
            x2, y2 = _GS_POLY[(i + 1) % n]
            total += math.atan2(
                (x1 - px) * (y2 - py) - (x2 - px) * (y1 - py),
                (x1 - px) * (x2 - px) + (y1 - py) * (y2 - py),
            )
        return abs(total) > math.pi  # ~2*pi inside, ~0 outside

    expect = {
        r["c_custkey"] for r in pts if winding(r["lon"], r["lat"])
    }
    got = {r["c_custkey"] for r in geo_shape_polygon(spark, sf_dir).collect()}
    assert got == expect
    assert got and len(got) < len(pts)  # non-vacuous both ways


# ------------------------------------------------------ mlm_masking_prep


def test_mlm_masking_rederived_and_ratios(spark, sf_dir):
    """Every doc's masked stream, label stream, and branch counts
    re-derived with an independent Python replica of the hash rules;
    aggregate branch ratios sit near 15% x 80/10/10."""
    import hashlib

    from go_pulsar_elasticsearch_spark.llm.corpus import (
        _MLM_MASK_LT,
        _MLM_RAND_LT,
        _MLM_SEL_LT,
        mlm_masking_prep,
    )

    def b256(doc_id, pos, salt):
        h = hashlib.md5(f"{doc_id}:{pos}:{salt}".encode()).hexdigest()
        return int(h[0], 16) * 16 + int(h[1], 16)

    def u16(doc_id, pos, salt):
        h = hashlib.md5(f"{doc_id}:{pos}:{salt}".encode()).hexdigest()
        return int(h[2:6], 16)

    texts = _texts(spark, sf_dir)
    rows = mlm_masking_prep(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == set(texts)
    tot_sel = tot_mask = tot_rand = tot_keep = tot_pos = 0
    for r in rows:
        w = texts[r["doc_id"]].split(" ")
        out, labels = [], []
        n_mask = n_rand = n_keep = 0
        for j, word in enumerate(w):
            pos = j + 1
            if b256(r["doc_id"], pos, "sel") < _MLM_SEL_LT:
                labels.append(f"{pos}:{word}")
                act = b256(r["doc_id"], pos, "act")
                if act < _MLM_MASK_LT:
                    out.append("[MASK]")
                    n_mask += 1
                elif act < _MLM_RAND_LT:
                    out.append(w[u16(r["doc_id"], pos, "act") % len(w)])
                    n_rand += 1
                else:
                    out.append(word)
                    n_keep += 1
            else:
                out.append(word)
        assert r["n_masked"] == n_mask
        assert r["n_random"] == n_rand
        assert r["n_kept"] == n_keep
        assert r["masked_md5"] == hashlib.md5(
            " ".join(out).encode()
        ).hexdigest()
        assert r["labels_md5"] == hashlib.md5(
            " ".join(labels).encode()
        ).hexdigest()
        tot_sel += n_mask + n_rand + n_keep
        tot_mask += n_mask
        tot_rand += n_rand
        tot_keep += n_keep
        tot_pos += len(w)
    assert 0.10 < tot_sel / tot_pos < 0.20
    assert 0.70 < tot_mask / tot_sel < 0.90
    assert 0.05 < tot_rand / tot_sel < 0.16
    assert 0.05 < tot_keep / tot_sel < 0.16


# ----------------------------------------------------------- explain_api


def test_explain_factors_recompose_the_certified_score(spark, sf_dir):
    """The Explanation must EXPLAIN the score: per (doc, term) the
    contribution tracks idf x saturation (each factor rounded at 6
    like the op emits them), and per doc the contributions sum to
    EXACTLY the bm25_search score for the same query."""
    from go_pulsar_elasticsearch_spark.llm.search import bm25_search
    from go_pulsar_elasticsearch_spark.llm.search_template import (
        _EX_TERMS,
        explain_api,
    )
    from go_pulsar_elasticsearch_spark.llm.search import _QUERY_TERMS

    assert _EX_TERMS == _QUERY_TERMS  # same query by construction
    rows = explain_api(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_doc: dict = defaultdict(float)
    for r in rows:
        assert r["tf"] > 0 and r["df"] > 0
        # factors multiply back to the contribution (factors are
        # individually rounded, so allow the last-place slack that
        # rounding twice introduces)
        assert math.isclose(
            r["idf"] * r["saturation"], r["contribution"], abs_tol=2e-6
        )
        by_doc[r["doc_id"]] += r["contribution"]
    # the per-doc sums must match the certified top-k scores exactly
    # (same decimal contributions summed)
    for s in bm25_search(spark, sf_dir).collect():
        assert math.isclose(by_doc[s["doc_id"]], s["score"], abs_tol=1e-9)


# ---------------------------------------------------- ann_binary_hamming


def test_binary_hamming_recall_vs_exact(spark, sf_dir):
    """The BBQ probe's top-5 (after exact re-rank) must recall most of
    the TRUE exact-cosine top-5 (similarity_topk), and its cosine
    column must equal the exact op's for shared (qid, vid) pairs;
    Hamming distances re-derived from independently recomputed codes."""
    from go_pulsar_elasticsearch_spark.llm.similarity import (
        _BH_TOPK,
        ann_binary_hamming,
        similarity_topk,
    )

    # Recall is measured at sf0.01: with sf0.001's ~50 vectors the
    # random-shortlist chance level (RERANK/n) is already ~40% and
    # small-sample noise swamps the code signal; at 500 vectors chance
    # is 4% and the measured recall is ~50% — the honest operating
    # point for 1-bit codes over UNSTRUCTURED random embeddings (real
    # embedding manifolds do far better; ES oversamples the same way).
    import os

    recall_dir = os.path.join(
        os.path.dirname(os.path.abspath(sf_dir).rstrip("/")), "sf0.01"
    )
    got = ann_binary_hamming(spark, recall_dir).collect()
    exact = similarity_topk(spark, recall_dir).collect()
    by_q_got: dict = {}
    by_q_exact: dict = {}
    cos_got = {}
    cos_exact = {}
    for r in got:
        by_q_got.setdefault(r["qid"], set()).add(r["vid"])
        cos_got[(r["qid"], r["vid"])] = r["cosine"]
    for r in exact:
        by_q_exact.setdefault(r["qid"], set()).add(r["vid"])
        cos_exact[(r["qid"], r["vid"])] = r["cosine"]
    assert set(by_q_got) == set(by_q_exact)
    hits = total = 0
    for q in by_q_exact:
        assert len(by_q_got[q]) == _BH_TOPK
        hits += len(by_q_got[q] & by_q_exact[q])
        total += len(by_q_exact[q])
    assert hits / total >= 0.4  # >= 10x the 4% chance level
    # and the re-rank makes shared pairs carry the EXACT cosine
    for k in set(cos_got) & set(cos_exact):
        assert math.isclose(cos_got[k], cos_exact[k], rel_tol=1e-12)
    # Hamming re-derivation from independently computed codes
    import numpy as np

    emb = t(spark, recall_dir, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    ctr = np.mean(np.stack(list(vecs.values())), axis=0)
    codes = {k: (v >= ctr) for k, v in vecs.items()}
    for r in got:
        ham = int(np.sum(codes[r["qid"]] != codes[r["vid"]]))
        assert r["hamming"] == ham


def test_search_template_single_pass_no_injection():
    """A param VALUE containing mustache text stays a literal (no
    re-substitution), and an unbound template var raises instead of
    leaking through."""
    import pytest as _pytest

    from go_pulsar_elasticsearch_spark.llm.search_template import (
        render_search_template,
    )

    out = render_search_template(
        '{"term": {"text": {{#toJson}}q{{/toJson}}}, "n": {{min_chars}}}',
        {"q": "{{min_chars}}", "min_chars": 9},
    )
    assert out["term"]["text"] == "{{min_chars}}"  # literal, not 9
    assert out["n"] == 9
    with _pytest.raises(KeyError):
        render_search_template('{"a": {{missing}}}', {"q": 1})


# ---------------------------------------------- near_dedup_minhash_append


def test_minhash_append_equals_oneshot_and_reuses_store(spark, sf_dir):
    """Store+delta must produce EXACTLY the one-shot candidate set
    (pair-for-pair with band counts), the store must cover only base
    ids, and a second invocation must reuse the published artifact
    without rewriting it."""
    import os
    import shutil

    from go_pulsar_elasticsearch_spark.llm.dedup import (
        _mha_store_dir,
        near_dedup_minhash,
        near_dedup_minhash_append,
    )

    store = _mha_store_dir(sf_dir)
    shutil.rmtree(store, ignore_errors=True)  # force a fresh build
    got = {
        (r["doc_a"], r["doc_b"]): r["n_bands_agree"]
        for r in near_dedup_minhash_append(spark, sf_dir).collect()
    }
    oneshot = {
        (r["doc_a"], r["doc_b"]): r["n_bands_agree"]
        for r in near_dedup_minhash(spark, sf_dir).collect()
    }
    assert got == oneshot and got
    # the store exists, is marked, and covers ONLY the base half
    marker = os.path.join(store, "_INDEX_READY")
    assert os.path.exists(marker)
    max_id = max(
        r["doc_id"]
        for r in t(spark, sf_dir, "documents").select("doc_id").collect()
    )
    stored = spark.read.parquet(os.path.join(store, "sigs"))
    smax = stored.agg(F.max("doc_id")).collect()[0][0]
    assert smax <= max_id // 2
    # reuse: second run must not rewrite the artifact
    mtime = os.path.getmtime(marker)
    again = {
        (r["doc_a"], r["doc_b"]): r["n_bands_agree"]
        for r in near_dedup_minhash_append(spark, sf_dir).collect()
    }
    assert again == got
    assert os.path.getmtime(marker) == mtime
