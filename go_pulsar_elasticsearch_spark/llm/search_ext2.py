"""ES search parity, part 3: multi_match (best_fields/dis_max) and the
intervals query.

Two query-DSL features next to the shipped match/phrase/span family
(llm/search.py, llm/search_ext.py — the surface a user of the
reference's ES index queries, mapping.json's text fields):

  multi_match_dismax      — ES `multi_match` type=best_fields (the
                            default), which compiles to `dis_max` over
                            per-field BM25 scores with a tie_breaker:
                            score = max(fields) + tie * sum(others).
  intervals_ordered_query — ES `intervals` with an ordered `all_of`
                            and max_gaps: the two terms must appear in
                            ORDER with at most max_gaps intervening
                            tokens (span_near_query is the unordered
                            sibling; ordering halves the candidate
                            pairs and is what "phrase with slop"
                            compiles to in Lucene).

Both reuse the certified scaffolding: multi_match scores each field
with the single-sourced BM25 contribution (search._bm25_contrib with a
field suffix — the formula cannot drift from bm25_search), and the
intervals op walks the same per-row position arrays as span_near.

100 TB posture: zero-shuffle scans — per-field tf/dl columns come from
one staged tokenization, the 1-row stats frame broadcasts, and the
top-k is TakeOrderedAndProject; position arrays never leave their row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.search import (
    _bm25_contrib,
    _contrib_sql,
)
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# multi_match_dismax  (ES multi_match type=best_fields + tie_breaker)
# --------------------------------------------------------------------------

_MM_TERMS = ("data", "column")
_MM_TITLE_TOKENS = 8  # the "title" field: the doc's first 8 tokens
_MM_TIE = 0.3
_MM_TOPN = 10

_N_T = len(_MM_TERMS)


def _mm_base_sql() -> str:
    tf_t = ", ".join(
        f"len(list_filter(tw, x -> x = '{t_}')) AS tf{i}_t"
        for i, t_ in enumerate(_MM_TERMS)
    )
    tf_b = ", ".join(
        f"len(list_filter(w, x -> x = '{t_}')) AS tf{i}_b"
        for i, t_ in enumerate(_MM_TERMS)
    )
    return (
        "SELECT doc_id,\n"
        "         len(list_filter(tw, x -> x <> '')) AS dl_t,\n"
        f"         {tf_t},\n"
        "         len(list_filter(w, x -> x <> '')) AS dl_b,\n"
        f"         {tf_b}\n"
        "  FROM (SELECT doc_id, w, list_slice(w, 1, "
        f"{_MM_TITLE_TOKENS}) AS tw\n"
        "        FROM (SELECT doc_id, string_split(text, ' ') AS w"
        " FROM documents))"
    )


def _mm_stats_sql() -> str:
    per_field = []
    for sfx in ("_t", "_b"):
        per_field.append(
            f"CAST(SUM(dl{sfx}) AS DOUBLE) / COUNT(*) AS avgdl{sfx}"
        )
        per_field.extend(
            f"SUM(CASE WHEN tf{i}{sfx} > 0 THEN 1 ELSE 0 END) AS df{i}{sfx}"
            for i in range(_N_T)
        )
    return (
        "SELECT COUNT(*) AS n_docs, " + ", ".join(per_field) + " FROM base"
    )


_MM_ANY_MATCH = " OR ".join(
    f"tf{i}{sfx} > 0" for sfx in ("_t", "_b") for i in range(_N_T)
)

_MULTI_MATCH_ORACLE = f"""
WITH base AS (
  {_mm_base_sql()}
), stats AS (
  {_mm_stats_sql()}
), scored AS (
  SELECT doc_id,
         CAST({" + ".join(_contrib_sql(i, "_t") for i in range(_N_T))}
           AS DOUBLE) AS score_title,
         CAST({" + ".join(_contrib_sql(i, "_b") for i in range(_N_T))}
           AS DOUBLE) AS score_body
  FROM base CROSS JOIN stats
  WHERE {_MM_ANY_MATCH}
)
SELECT doc_id, score_title, score_body, score, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT doc_id, score_title, score_body,
         greatest(score_title, score_body)
           + {_MM_TIE} * least(score_title, score_body) AS score,
         row_number() OVER (
           ORDER BY greatest(score_title, score_body)
                      + {_MM_TIE} * least(score_title, score_body) DESC,
                    doc_id) AS rk
  FROM scored
)
WHERE rk <= {_MM_TOPN}
"""


@register("multi_match_dismax", _MULTI_MATCH_ORACLE)
def multi_match_dismax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``multi_match`` type=best_fields over (title, body) with
    tie_breaker=0.3 — the dis_max compilation: per-field BM25, then
    score = max(field scores) + tie * min (two fields, so the "sum of
    the others" IS the min).  The title field is the doc's first
    8 tokens (mapping.json-style multi-field of the
    same source text); each field carries its own dl/avgdl/df while
    n_docs is index-wide — exactly ES's per-field statistics rule.

    The per-term contribution is the single-sourced certified formula
    (search._bm25_contrib, suffix-scoped), so this op cannot drift
    from bm25_search.  One staged tokenization feeds both fields'
    tf/dl columns (the split evaluates once per row); the stats frame
    is 1 row broadcast; the cut is TakeOrderedAndProject.  Zero
    data-sized shuffles."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", F.split("text", " ").alias("_w")
    ).select(
        "doc_id",
        F.col("_w").alias("w"),
        F.slice("_w", 1, _MM_TITLE_TOKENS).alias("tw"),
    )
    cols = []
    for sfx, arr in (("_t", "tw"), ("_b", "w")):
        cols.append(
            F.size(F.filter(F.col(arr), lambda x: x != ""))
            .cast("bigint")
            .alias(f"dl{sfx}")
        )
        for i, term in enumerate(_MM_TERMS):
            cols.append(
                F.size(
                    F.filter(
                        F.col(arr), (lambda t_: lambda x: x == t_)(term)
                    )
                ).alias(f"tf{i}{sfx}")
            )
    base = staged.select("doc_id", *cols)
    stat_cols = [F.count("*").alias("n_docs")]
    for sfx in ("_t", "_b"):
        stat_cols.append(
            (F.sum(f"dl{sfx}").cast("double") / F.count("*")).alias(
                f"avgdl{sfx}"
            )
        )
        stat_cols.extend(
            F.sum(F.when(F.col(f"tf{i}{sfx}") > 0, 1).otherwise(0)).alias(
                f"df{i}{sfx}"
            )
            for i in range(_N_T)
        )
    stats = base.agg(*stat_cols)

    def field_score(sfx: str) -> F.Column:
        s = _bm25_contrib(0, sfx)
        for i in range(1, _N_T):
            s = s + _bm25_contrib(i, sfx)
        return s.cast("double")

    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(_MM_ANY_MATCH)
        .select(
            "doc_id",
            field_score("_t").alias("score_title"),
            field_score("_b").alias("score_body"),
        )
    )
    st, sb = F.col("score_title"), F.col("score_body")
    score = F.greatest(st, sb) + F.lit(_MM_TIE) * F.least(st, sb)
    topk = (
        scored.withColumn("score", score)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_MM_TOPN)
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return topk.select(
        "doc_id", "score_title", "score_body", "score", rk.alias("rk")
    )


# --------------------------------------------------------------------------
# intervals_ordered_query  (ES intervals: ordered all_of with max_gaps)
# --------------------------------------------------------------------------

_IV_TERMS = ("data", "column")
_IV_MAX_GAPS = 4

_INTERVALS_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
         list_filter(range(1, len(w) + 1),
                     j -> w[j] = '{_IV_TERMS[0]}') AS p1,
         list_filter(range(1, len(w) + 1),
                     j -> w[j] = '{_IV_TERMS[1]}') AS p2
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
SELECT doc_id, n_spans, tightest FROM (
  SELECT doc_id,
         CAST(len(list_filter(p1, x -> len(list_filter(p2,
           y -> y > x AND y - x - 1 <= {_IV_MAX_GAPS})) > 0))
           AS INTEGER) AS n_spans,
         CAST(list_min(list_transform(
           list_filter(p1, x -> len(list_filter(p2,
             y -> y > x AND y - x - 1 <= {_IV_MAX_GAPS})) > 0),
           x -> list_min(list_transform(list_filter(p2,
             y -> y > x AND y - x - 1 <= {_IV_MAX_GAPS}),
             y -> y - x + 1)))) AS INTEGER) AS tightest
  FROM p
) WHERE n_spans > 0
"""


@register("intervals_ordered_query", _INTERVALS_ORACLE)
def intervals_ordered_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``intervals`` query, ordered ``all_of`` with max_gaps=4:
    documents where 'data' is followed by 'column' with at most
    max_gaps intervening tokens — the ordered sibling of
    span_near_query (whose slop is
    bidirectional).  Reports the qualifying start-position count and
    the tightest matching interval's width (ES's minimal-interval
    semantics score by interval length).

    Scan shape, same contract as span_near: postings intersection
    first, per-row position arrays from one filter(sequence) pass,
    single-level lambdas only (nested HOFs are interpreted), and only
    the two per-matched-doc numbers cross the wire (map-side
    combined)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    # postings-intersection pre-filter (see span_near_query): docs
    # lacking either term can produce no ordered interval, so the
    # cheap array_contains gate excludes them before the O(len)
    # position extraction
    pos = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(
        F.array_contains("w", _IV_TERMS[0])
        & F.array_contains("w", _IV_TERMS[1])
    ).select(
        "doc_id",
        F.expr(
            "filter(sequence(1, size(w)),"
            f" j -> element_at(w, j) = '{_IV_TERMS[0]}')"
        ).alias("p1"),
        F.expr(
            "filter(sequence(1, size(w)),"
            f" j -> element_at(w, j) = '{_IV_TERMS[1]}')"
        ).alias("p2"),
    )
    # per-occurrence scoring: explode the (small, post-intersection) p1
    # array; each start position evaluates ONE single-level lambda over
    # p2 (nested HOFs are interpreted CodegenFallback — the span_near
    # lesson, measured ~2.7x), then re-aggregate per doc: n_spans =
    # count of starts with a partner, tightest = min span width.  Only
    # two small numbers per matched doc cross the wire.
    widths = F.expr(
        f"transform(filter(p2, y -> y > x AND y - x - 1 <= {_IV_MAX_GAPS}),"
        f" y -> y - x + 1)"
    )
    per_start = (
        pos.select("doc_id", F.explode("p1").alias("x"), "p2")
        .select("doc_id", widths.alias("ws"))
        .select(
            "doc_id",
            F.when(F.size("ws") > 0, 1).otherwise(0).alias("hit"),
            F.array_min("ws").alias("minw"),
        )
    )
    return (
        per_start.groupBy("doc_id")
        .agg(
            F.sum("hit").cast("int").alias("n_spans"),
            F.min("minw").cast("int").alias("tightest"),
        )
        .filter(F.col("n_spans") > 0)
    )
