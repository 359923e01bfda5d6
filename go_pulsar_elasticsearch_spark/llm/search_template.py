"""ES search-template, terms-lookup, _rank_eval, and _explain parity.

Four request-level ES APIs layered on the certified query machinery:

  search_template    — the `_search/template` endpoint: a mustache
                       template rendered with params into a JSON query,
                       then compiled by the certified Query-DSL compiler
                       (llm/query_dsl.py) — the rendering and the
                       compilation are certified as ONE plan.
  terms_lookup_query — the `terms` query's lookup form: the term list
                       is fetched from another indexed document (here:
                       a designated vocab doc's tokens) instead of
                       being inlined in the request.
  rank_eval_api      — the `_rank_eval` endpoint: precision@k, recall@k
                       and MRR per rated query over the engine's own
                       BM25 ranking, plus the endpoint's mean score.
  explain_api        — the `_explain` endpoint: the per-term Lucene
                       Explanation factors (idf, tf saturation,
                       contribution) for every matching doc of the
                       certified bm25_search query.

100 TB posture: template rendering is driver-side string work on a
KB-sized request (never per-row); the lookup term list rides a 1-row
broadcast (no driver collect); rank_eval shares ONE tokenization pass
across all rated queries and its windows are query-partitioned — raw
rows never cross an unpartitioned boundary.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.query_dsl import search
from go_pulsar_elasticsearch_spark.llm.search import (
    _bm25_contrib,
    _contrib_sql,
    bm25_base_frame,
    bm25_base_sql,
    bm25_stats_frame,
    bm25_stats_sql,
)
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# search_template  (ES _search/template: mustache -> DSL -> plan)
# --------------------------------------------------------------------------


def render_search_template(template: str, params: dict[str, Any]) -> dict:
    """The mustache subset ES templates actually use: ``{{var}}``
    scalar substitution and ``{{#toJson}}var{{/toJson}}`` JSON-encoded
    injection (the documented way to pass arrays/objects).  Scalars are
    JSON-encoded too when they land in value position — the template
    below quotes nothing itself, exactly like ES examples that rely on
    toJson for safety.  SINGLE-PASS substitution over the original
    template: a param VALUE containing mustache-looking text stays a
    literal (re-scanning substituted output would let one param's
    value be rewritten by another's — template injection — and would
    make rendering depend on dict order).  Driver-side only:
    templates are KB-sized request bodies, never per-row data."""
    import re

    def _sub(m: "re.Match[str]") -> str:
        k = m.group(1) or m.group(2)
        if k not in params:
            raise KeyError(f"search template references unbound param {k!r}")
        return json.dumps(params[k])

    out = re.sub(
        r"\{\{#toJson\}\}(\w+)\{\{/toJson\}\}|\{\{(\w+)\}\}",
        _sub,
        template,
    )
    rendered = json.loads(out)
    if isinstance(rendered, dict) and "source" in rendered:
        rendered = rendered["source"]
    return rendered


# The stored template (ES `script.source` form) and the request params —
# a saved search a dashboard would invoke by id with fresh params.
_ST_TEMPLATE = """
{"source": {"bool": {
  "must": [
    {"match": {"text": {{#toJson}}q{{/toJson}}}},
    {"range": {"n_chars": {"gte": {{min_chars}}}}}
  ],
  "filter": [{"terms": {"source": {{#toJson}}sources{{/toJson}}}}]
}}}
"""
_ST_PARAMS: dict[str, Any] = {
    "q": "merge batch",
    "min_chars": 250,
    "sources": ["src0", "src2", "src4", "src6", "src8"],
}

_ST_ORACLE = """
SELECT doc_id, source, n_chars
FROM documents
WHERE list_contains(string_split(text, ' '), 'merge')
  AND list_contains(string_split(text, ' '), 'batch')
  AND n_chars >= 250
  AND source IN ('src0', 'src2', 'src4', 'src6', 'src8')
"""


@register("search_template", _ST_ORACLE)
def search_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_search/template``: the stored mustache template is rendered
    with this request's params ({{var}} + {{#toJson}}), parsed, and
    compiled by the certified Query-DSL compiler — so the oracle
    certifies the whole render->parse->compile->execute chain against
    the hand-written SQL twin of the EXPECTED rendering.  A param
    change that leaked quoting or dropped a clause would hash-fail.

    Plan: identical to query_dsl_compile's — plain Column algebra;
    the n_chars range and source IN list are pushed scan filters."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    rendered = render_search_template(_ST_TEMPLATE, _ST_PARAMS)
    return search(docs, rendered).select("doc_id", "source", "n_chars")


# --------------------------------------------------------------------------
# terms_lookup_query  (ES terms lookup: term list fetched from a doc)
# --------------------------------------------------------------------------

_TL_LOOKUP_DOC = 5  # the "vocab document" whose tokens form the term list

_TERMS_LOOKUP_ORACLE = f"""
WITH lookup AS (
  SELECT list_distinct(list_filter(string_split(text, ' '),
                                   x -> x <> '')) AS terms
  FROM documents WHERE doc_id = {_TL_LOOKUP_DOC}
)
SELECT doc_id,
       CAST(len(list_filter(list_distinct(w), x -> list_contains(terms, x)))
            AS INTEGER) AS n_shared_terms
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
     CROSS JOIN lookup
WHERE doc_id <> {_TL_LOOKUP_DOC}
  AND len(list_filter(list_distinct(w), x -> list_contains(terms, x))) > 0
"""


@register("terms_lookup_query", _TERMS_LOOKUP_ORACLE)
def terms_lookup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``terms`` query in LOOKUP form: the term list is read from
    another indexed document (doc {d}'s distinct tokens) at query time
    instead of being inlined — ES's mechanism for "match any word that
    appears in this other document".  Emits matching docs with their
    shared-term count (the lookup doc itself excluded, as ES users
    filter it).

    Plan: the 1-row lookup frame broadcasts into a crossJoin (the
    ES-side GET of the lookup doc; never a driver collect), the
    intersection is one per-row single-level lambda over the staged
    distinct-token array, and the scan stays zero-shuffle."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    lookup = (
        docs.filter(F.col("doc_id") == _TL_LOOKUP_DOC)
        .select(
            F.array_distinct(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("terms")
        )
    )
    shared = F.size(
        F.expr("filter(array_distinct(w), x -> array_contains(terms, x))")
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.col("doc_id") != _TL_LOOKUP_DOC)
        .crossJoin(F.broadcast(lookup))
        .select("doc_id", shared.cast("int").alias("n_shared_terms"))
        .filter(F.col("n_shared_terms") > 0)
    )


# --------------------------------------------------------------------------
# rank_eval_api  (ES _rank_eval: precision@k / recall@k / MRR)
# --------------------------------------------------------------------------

_RE_QUERIES = ("merge", "table", "spark")  # one rated request per term
_RE_K = 10
_N_RE = len(_RE_QUERIES)

# Deterministic graded relevance for (query, doc): (doc_id + qid) % 3,
# binary-relevant when > 0 — the rated-document lists a _rank_eval
# request carries, synthesized the house way (cf. ndcg_eval's doc_id%4).
_RE_REL = "((doc_id + {q}) % 3)"


def _re_scored_sql() -> str:
    """Per (query, doc) single-term BM25 score + relevance, SQL side."""
    arms = []
    for q in range(_N_RE):
        arms.append(
            f"SELECT {q} AS qid, doc_id,\n"
            f"       CAST({_contrib_sql(q)} AS DOUBLE) AS score,\n"
            f"       CASE WHEN {_RE_REL.format(q=q)} > 0 THEN 1 ELSE 0 END"
            f" AS rel\n"
            f"FROM base CROSS JOIN stats WHERE tf{q} > 0"
        )
    return "\n  UNION ALL\n".join(arms)


_RANK_EVAL_ORACLE = f"""
WITH base AS (
  {bm25_base_sql(_RE_QUERIES)}
), stats AS (
  {bm25_stats_sql(_N_RE)}
), scored AS (
  {_re_scored_sql()}
), ranked AS (
  SELECT qid, doc_id, score, rel,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rk
  FROM scored
), per_query AS (
  SELECT qid,
    CAST(SUM(CASE WHEN rk <= {_RE_K} THEN rel ELSE 0 END) AS BIGINT)
      AS n_at_k,
    CAST(SUM(rel) AS BIGINT) AS n_rel,
    CAST(ROUND(COALESCE(1.0 / MIN(CASE WHEN rel = 1 THEN rk END), 0.0),
               6) AS DOUBLE) AS mrr
  FROM ranked GROUP BY qid
)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(n_at_k AS DOUBLE) / {_RE_K} AS precision_at_k,
       CASE WHEN n_rel > 0 THEN CAST(n_at_k AS DOUBLE) / n_rel
            ELSE CAST(NULL AS DOUBLE) END AS recall_at_k,
       mrr,
       -- integer numerator summed across queries, ONE double division:
       -- the mean cannot pick up engine-specific summation order
       CAST(SUM(n_at_k) OVER () AS DOUBLE) / {_RE_K * _N_RE}
         AS mean_precision
FROM per_query
"""


@register("rank_eval_api", _RANK_EVAL_ORACLE)
def rank_eval_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_rank_eval``: three rated single-term requests evaluated
    over the engine's OWN certified BM25 ranking — precision@{k},
    recall@{k} (relevant-found / all-relevant-retrieved, the ES
    definition), and MRR (reciprocal rank of the first relevant hit,
    rounded like every transcendental before averaging), plus the
    endpoint's metric_score mean.  Relevance labels are deterministic
    grades ((doc_id+qid)%3, binary at >0) — the rated lists the
    request body carries.

    Plan: ONE tokenization/stats pass shared by all three queries
    (tf0..tf2 in one base frame), per-query ranking via
    qid-PARTITIONED windows, and the mean is a 3-row window — bounded
    by the request's query count, not the corpus."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    base = bm25_base_frame(docs, _RE_QUERIES)
    stats = bm25_stats_frame(base, _N_RE)
    joined = base.crossJoin(F.broadcast(stats))
    arms = []
    for q in range(_N_RE):
        arms.append(
            joined.filter(F.col(f"tf{q}") > 0).select(
                F.lit(q).alias("qid"),
                "doc_id",
                _bm25_contrib(q).cast("double").alias("score"),
                F.when((F.col("doc_id") + q) % 3 > 0, 1)
                .otherwise(0)
                .alias("rel"),
            )
        )
    scored = arms[0]
    for a in arms[1:]:
        scored = scored.unionByName(a)
    wq = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.withColumn("rk", F.row_number().over(wq))
    in_k = F.when(F.col("rk") <= _RE_K, F.col("rel")).otherwise(0)
    per_query = ranked.groupBy("qid").agg(
        F.sum(in_k).cast("bigint").alias("n_at_k"),
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.round(
            F.coalesce(
                1.0
                / F.min(F.when(F.col("rel") == 1, F.col("rk"))),
                F.lit(0.0),
            ),
            6,
        )
        .cast("double")
        .alias("mrr"),
    )
    # integer numerator summed across the (query-count-bounded) frame,
    # ONE double division — no engine-order-sensitive double sum
    mean_p = F.sum("n_at_k").over(Window.partitionBy()).cast(
        "double"
    ) / (_RE_K * _N_RE)
    return per_query.select(
        F.col("qid").cast("bigint").alias("qid"),
        (F.col("n_at_k").cast("double") / _RE_K).alias("precision_at_k"),
        # guarded like the oracle: a rated query with zero relevant
        # matching docs yields NULL recall on BOTH engines (Spark 4's
        # default ANSI mode would otherwise raise DIVIDE_BY_ZERO)
        F.when(
            F.col("n_rel") > 0,
            F.col("n_at_k").cast("double") / F.col("n_rel"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("recall_at_k"),
        "mrr",
        mean_p.alias("mean_precision"),
    )


# --------------------------------------------------------------------------
# explain_api  (ES _explain: per-term score breakdown for one doc)
# --------------------------------------------------------------------------

# The _explain endpoint answers "WHY does doc X score S for query Q":
# per query term, the idf and tf-saturation factors and their product,
# exactly the tree Lucene's Explanation renders.  Emitted for every
# matching doc of the bm25_search query (one row per (doc, term) with
# the factors), so the certified surface is the full breakdown table —
# the single-doc endpoint is a doc_id filter away.  Terms and the
# k1/b constants are IMPORTED from the certified scorer (never
# redeclared) so the explanation cannot drift from what bm25_search
# actually computes — the single-sourcing rule search.py's docstring
# mandates.
from go_pulsar_elasticsearch_spark.llm.search import (  # noqa: E402
    _B as _EX_B,
    _K1 as _EX_K1,
    _QUERY_TERMS as _EX_TERMS,
)

_N_EX = len(_EX_TERMS)


def _ex_parts_sql(i: int) -> str:
    """idf, saturation, and contribution for term i — the same formula
    text as search._contrib_sql, decomposed into Lucene's two factors
    (constants imported from the scorer)."""
    tf, df = f"tf{i}", f"df{i}"
    idf = f"ln(1 + (n_docs - {df} + 0.5) / ({df} + 0.5))"
    sat = (
        f"{tf} * ({_EX_K1} + 1)"
        f" / ({tf} + {_EX_K1} * (1 - {_EX_B} + {_EX_B} * dl / avgdl))"
    )
    return (
        f"SELECT doc_id, '{_EX_TERMS[i]}' AS term,"
        f" CAST({tf} AS BIGINT) AS tf, CAST({df} AS BIGINT) AS df,"
        f" CAST(ROUND({idf}, 6) AS DOUBLE) AS idf,"
        f" CAST(ROUND({sat}, 6) AS DOUBLE) AS saturation,"
        f" CAST({_contrib_sql(i)} AS DOUBLE) AS contribution"
        f" FROM base CROSS JOIN stats WHERE {tf} > 0"
    )


_EXPLAIN_ORACLE = f"""
WITH base AS (
  {bm25_base_sql(_EX_TERMS)}
), stats AS (
  {bm25_stats_sql(_N_EX)}
)
{" UNION ALL ".join(_ex_parts_sql(i) for i in range(_N_EX))}
"""


@register("explain_api", _EXPLAIN_ORACLE)
def explain_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_explain``: the per-term Lucene Explanation tree for the
    bm25_search query, one row per (matching doc, term) carrying tf,
    df, the idf and tf-saturation factors (each rounded at 6 like
    every transcendental), and the certified contribution — whose
    product structure the pytest re-multiplies.  The factors use the
    same column frame as the single-sourced scorer, so an explain that
    disagreed with the score is impossible by construction.

    Plan: the shared base/stats frames (one tokenization, 1-row
    broadcast); three per-term projections unioned — zero data-sized
    shuffles, output bounded by matches x terms."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    base = bm25_base_frame(docs, _EX_TERMS)
    stats = bm25_stats_frame(base, _N_EX)
    joined = base.crossJoin(F.broadcast(stats))
    k1, b = _EX_K1, _EX_B  # imported from the certified scorer
    arms = []
    for i, term in enumerate(_EX_TERMS):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        sat = (
            tf * (k1 + 1)
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )
        arms.append(
            joined.filter(tf > 0).select(
                "doc_id",
                F.lit(term).alias("term"),
                tf.cast("bigint").alias("tf"),
                df.cast("bigint").alias("df"),
                F.round(idf, 6).cast("double").alias("idf"),
                F.round(sat, 6).cast("double").alias("saturation"),
                _bm25_contrib(i).cast("double").alias("contribution"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out
