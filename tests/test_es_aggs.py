"""ES aggregation parity ops: top_hits, multi_terms, matrix_stats,
terms_set, and the pHash image near-dup.

Oracle equivalence is certified by the registry sweep (every op here is
fully oracled); these tests pin the SEMANTIC invariants the oracle match
alone would not explain — rank bounds, cap behavior, matrix symmetry
identities, and the perceptual-hash separation property.
"""

from __future__ import annotations

import math

import pytest

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from go_pulsar_elasticsearch_spark.operators.es_aggs import (  # noqa: E402
    _MULTI_TERMS_SIZE,
    _TERMS_MIN_MATCH,
    _TOP_HITS_K,
    matrix_stats_agg,
    multi_terms_agg,
    terms_set_match,
    top_hits_agg,
)


def test_top_hits_rank_and_doc_count(spark, sf_dir):
    rows = top_hits_agg(spark, sf_dir).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.hit_rank <= _TOP_HITS_K
        by_src.setdefault(r.source, []).append(r)
    docs = {
        r.source: r.cnt
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    for src, hits in by_src.items():
        # every bucket emits min(k, bucket size) hits, doc_count exact,
        # and hits arrive sorted by the (n_chars DESC, doc_id) key
        assert len(hits) == min(_TOP_HITS_K, docs[src])
        assert all(h.doc_count == docs[src] for h in hits)
        ordered = sorted(hits, key=lambda h: h.hit_rank)
        keys = [(-h.n_chars, h.doc_id) for h in ordered]
        assert keys == sorted(keys)


def test_multi_terms_cap_and_order(spark, sf_dir):
    rows = multi_terms_agg(spark, sf_dir).collect()
    assert 0 < len(rows) <= _MULTI_TERMS_SIZE
    counts = [r.doc_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # the cap keeps the GLOBALLY largest buckets: nothing excluded may
    # exceed the smallest kept doc_count
    all_rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang", "source")
        .count()
        .collect()
    )
    kept = {(r.lang, r.source) for r in rows}
    floor = min(counts)
    for r in all_rows:
        if (r.lang, r.source) not in kept:
            assert r["count"] <= floor


def test_matrix_stats_identities(spark, sf_dir):
    rows = {(r.field_a, r.field_b): r for r in matrix_stats_agg(spark, sf_dir).collect()}
    fields = ["l_discount", "l_extendedprice", "l_quantity"]
    assert set(rows) == {(a, b) for a in fields for b in fields if a <= b}
    n = next(iter(rows.values())).n
    for (a, b), r in rows.items():
        assert r.n == n
        assert abs(r.correlation) <= 1.0 + 1e-12
        if a == b:
            # diagonal: covariance IS the variance, correlation is 1
            assert r.correlation == 1.0
            assert r.covariance == pytest.approx(r.variance_a, rel=1e-12)
            assert r.variance_a > 0
    # cross-check one cell against the raw data definition
    import statistics

    data = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice")
        .collect()
    )
    q = [r.l_quantity for r in data]
    p = [r.l_extendedprice for r in data]
    mq, mp = statistics.fmean(q), statistics.fmean(p)
    cov = sum((a - mq) * (b - mp) for a, b in zip(q, p)) / (len(q) - 1)
    cell = rows[("l_extendedprice", "l_quantity")]
    assert cell.covariance == pytest.approx(cov, rel=1e-6)
    vq = statistics.variance(q)
    corr = cov / math.sqrt(vq * statistics.variance(p))
    assert cell.correlation == pytest.approx(corr, rel=1e-6)


def test_terms_set_threshold(spark, sf_dir):
    rows = terms_set_match(spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    matched_ids = {r.doc_id for r in rows}
    terms = {"spark", "join", "window"}
    for doc_id, text in docs.items():
        n = len(terms & set(text.split()))
        assert (doc_id in matched_ids) == (n >= _TERMS_MIN_MATCH)
    for r in rows:
        assert r.n_matched == len(terms & set(docs[r.doc_id].split()))


def test_phash_separation(spark, sf_dir):
    """Near-dup pairs (consecutive even/odd doc_ids sharing a base image)
    dominate the output; unrelated images never collide at radius 3.

    Since round 8 every pair also CROSSES the codec boundary (even
    doc = BMP round-trip, odd doc = PNG round-trip with all five
    scanline filters in rotation), so this separation property holding
    re-pins pHash on PNG inputs: a PNG unfilter/inflate bug would shift
    the odd side's pixels and break the <=3 Hamming pairing."""
    from go_pulsar_elasticsearch_spark.llm.multimodal import (
        image_phash_dct_neardup,
    )

    rows = image_phash_dct_neardup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= 3
        # every emitted pair is a true near-dup: same base image group,
        # and (doc_a even, doc_b odd) means one BMP + one PNG member
        assert r.doc_a // 2 == r.doc_b // 2
        assert r.doc_a % 2 == 0 and r.doc_b % 2 == 1


def test_multimodal_keepbest_invariants(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.llm.dedup import minhash_verify_jaccard
    from go_pulsar_elasticsearch_spark.llm.multimodal import (
        image_ahash_neardup,
        multimodal_dedup_keepbest,
    )

    rows = multimodal_dedup_keepbest(spark, sf_dir).collect()
    assert rows
    chars = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    text_edges = {
        (r.doc_a, r.doc_b) for r in minhash_verify_jaccard(spark, sf_dir).collect()
    }
    img_edges = {
        (r.doc_a, r.doc_b) for r in image_ahash_neardup(spark, sf_dir).collect()
    }
    for r in rows:
        assert r.doc_id != r.kept_by
        # the keeper strictly dominates under (n_chars DESC, doc_id ASC)
        assert (-chars[r.kept_by], r.kept_by) < (-chars[r.doc_id], r.doc_id)
        pair = (min(r.doc_id, r.kept_by), max(r.doc_id, r.kept_by))
        assert bool(r.via_text) == (pair in text_edges)
        assert bool(r.via_image) == (pair in img_edges)
        assert r.via_text or r.via_image


def test_search_request_e2e_semantics(spark, sf_dir):
    """Filter context prunes without touching scoring stats; collapse
    keeps one hit per source; ranks are dense from 1 in score order."""
    from go_pulsar_elasticsearch_spark.llm.search import (
        _REQ_SIZE,
        search_request_e2e,
    )

    rows = sorted(search_request_e2e(spark, sf_dir).collect(), key=lambda r: r.rk)
    assert rows
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= _REQ_SIZE
    assert len({r.source for r in rows}) == len(rows)  # collapsed
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = {
        r.doc_id: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows:
        d = docs[r.doc_id]
        # every hit satisfies the full bool query: match + filters
        words = set(d.text.split())
        assert {"spark", "join"} <= words
        assert d.lang == "en" and d.n_chars >= 200
        assert r.score > 0


def test_search_request_aggs_consistency(spark, sf_dir):
    """The aggs section describes the SAME filtered doc set as the hits
    section's pre-collapse input: bucket doc_counts sum to the filtered
    count, and every bucket's metric is internally consistent."""
    from go_pulsar_elasticsearch_spark.llm.query_dsl import compile_query
    from go_pulsar_elasticsearch_spark.llm.search import (
        _SEARCH_REQUEST,
        search_request_aggs,
    )

    rows = search_request_aggs(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    filtered = docs.filter(compile_query(_SEARCH_REQUEST))
    n_sources = filtered.select("source").distinct().count()
    if n_sources <= 10:  # cap not hit: buckets partition the filtered set
        assert sum(r.doc_count for r in rows) == filtered.count()
    for r in rows:
        assert r.avg_chars == r.sum_chars / r.doc_count
        assert r.doc_count > 0
