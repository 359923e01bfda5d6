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


def test_aggs_nested_buckets_and_metrics(spark):
    from go_pulsar_elasticsearch_spark.llm.query_dsl import es_search

    rows = [
        (1, "a", 10.0, "2024-01-01 10:00:00"),
        (2, "a", 20.0, "2024-01-01 23:00:00"),
        (3, "a", 30.0, "2024-01-02 01:00:00"),
        (4, "b", 5.0, "2024-01-01 09:00:00"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "id long, k string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    body = {
        "aggs": {
            "by_k": {
                "terms": {"field": "k"},
                "aggs": {
                    "by_day": {"date_histogram": {"field": "ts",
                                                  "calendar_interval": "day"},
                               "aggs": {"total": {"sum": {"field": "value"}},
                                        "n": {"value_count": {"field": "id"}}}},
                },
            }
        }
    }
    got = {
        (r["by_k"], str(r["by_day"])[:10]): (r["total"], r["n"])
        for r in es_search(df, body).collect()
    }
    assert got[("a", "2024-01-01")] == (30.0, 2)
    assert got[("a", "2024-01-02")] == (30.0, 1)
    assert got[("b", "2024-01-01")] == (5.0, 1)


def test_aggs_without_buckets_is_global(spark):
    from go_pulsar_elasticsearch_spark.llm.query_dsl import es_search

    df = spark.createDataFrame([(1, 2.0), (2, 4.0)], "id long, value double")
    out = es_search(df, {"aggs": {"mx": {"max": {"field": "value"}}}}).collect()
    assert out[0]["mx"] == 4.0


def test_empty_result_keeps_schema(spark):
    from go_pulsar_elasticsearch_spark.llm.query_dsl import es_search

    df = spark.createDataFrame([(1, "x", 1.0)], "id long, k string, value double")
    out = es_search(
        df,
        {"query": {"term": {"k": "nope"}},
         "aggs": {"by_k": {"terms": {"field": "k"}},
                  "n": {"value_count": {"field": "id"}}}},
    )
    assert out.count() == 0
    assert out.columns == ["by_k", "n"]


def test_empty_match_matches_nothing(docs):
    assert ids(docs, {"match": {"text": "   "}}) == []
