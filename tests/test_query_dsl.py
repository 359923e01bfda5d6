"""ES Query-DSL compiler: leaf semantics, bool composition, and the
minimum_should_match rule, on literal frames; pushdown on the real scan."""

from __future__ import annotations

import pytest

from go_pulsar_elasticsearch_spark.llm.query_dsl import compile_query, search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma", "en", "src1", 100),
        (2, "beta delta", "de", "src2", 250),
        (3, "alpha beta", None, "src13", 999),
        (4, "zeta", "en", "other", 50),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def ids(df, q):
    return sorted(r["doc_id"] for r in search(df, q).collect())


def test_term_terms_range_exists(docs):
    assert ids(docs, {"term": {"lang": "en"}}) == [1, 4]
    assert ids(docs, {"terms": {"source": ["src1", "src2"]}}) == [1, 2]
    assert ids(docs, {"range": {"n_chars": {"gte": 100, "lt": 999}}}) == [1, 2]
    assert ids(docs, {"exists": {"field": "lang"}}) == [1, 2, 4]


def test_prefix_wildcard_match(docs):
    assert ids(docs, {"prefix": {"source": "src1"}}) == [1, 3]
    assert ids(docs, {"wildcard": {"source": "src?"}}) == [1, 2]
    assert ids(docs, {"wildcard": {"source": "*her"}}) == [4]
    # match requires ALL tokens as whole words: "alpha beta" matches 1,3
    assert ids(docs, {"match": {"text": "beta alpha"}}) == [1, 3]
    # no substring matching: "alp" is not a token
    assert ids(docs, {"match": {"text": "alp"}}) == []


def test_bool_composition(docs):
    q = {
        "bool": {
            "must": [{"match": {"text": "beta"}}],
            "must_not": [{"term": {"lang": "de"}}],
        }
    }
    # doc 3 has NULL lang: must_not(term) must keep it (ES semantics:
    # a missing field never matches a term query)
    assert ids(docs, q) == [1, 3]


def test_should_is_optional_with_must_but_required_alone(docs):
    with_must = {
        "bool": {
            "must": [{"match": {"text": "beta"}}],
            "should": [{"term": {"source": "no_such"}}],
        }
    }
    # should doesn't filter when must exists (filter context)
    assert ids(docs, with_must) == [1, 2, 3]
    alone = {
        "bool": {
            "should": [
                {"term": {"source": "src1"}},
                {"term": {"source": "other"}},
            ]
        }
    }
    # alone: minimum_should_match = 1
    assert ids(docs, alone) == [1, 4]


def test_unsupported_kind_raises(docs):
    with pytest.raises(ValueError):
        compile_query({"fuzzy": {"text": "x"}})


def test_compiled_range_pushes_down(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.plans.inspect import has_pushed_filter
    from go_pulsar_elasticsearch_spark.registry import QUERIES

    df = QUERIES["query_dsl_compile"](spark, sf_dir)
    assert has_pushed_filter(df, "n_chars")
    assert has_pushed_filter(df, "source")
