"""ES search parity, part 4: match_phrase_prefix, combined_fields,
boosting, pinned, and span_first/span_or.

Five more query-DSL features next to the shipped match/phrase/span/
multi_match family (llm/search.py, search_ext.py, search_ext2.py) — the
remaining query types a user of the reference's ES index (mapping.json's
text fields; es.go:160-213 bulk-indexes whatever the template carries)
reaches for in Kibana or the Query DSL:

  match_phrase_prefix  — phrase whose LAST term is a prefix (the
                         search-as-you-type query): 'value' immediately
                         followed by a 'ta%' token.
  combined_fields      — term-centric scoring over several fields
                         treated as ONE combined field (tf and dl are
                         weighted sums across fields; one BM25 pass on
                         the combined statistics) — the principled
                         successor to cross_fields.
  boosting_query       — positive BM25 query whose score is multiplied
                         by negative_boost when the doc also matches
                         the negative clause (demotion, not exclusion).
  pinned_query         — promoted ids rank first in their given order;
                         organic BM25 matches follow.
  span_first_or_query  — span_or of two terms wrapped in span_first:
                         either term within the first N positions.

All scorers reuse the single-sourced certified BM25 scaffolding
(search.bm25_base_frame / _bm25_contrib with a field suffix), so no
formula can drift from bm25_search.

100 TB posture: every op is a zero-shuffle scan over one staged
tokenization; index statistics are 1-row broadcasts; every cut is
TakeOrderedAndProject (bounded), and position logic is single-level
array lambdas that never leave their row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.search import (
    _bm25_contrib,
    _contrib_sql,
    _eq_term,
    bm25_base_frame,
    bm25_base_sql,
    bm25_score_col,
    bm25_stats_frame,
    bm25_stats_sql,
)
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# match_phrase_prefix  (ES match_phrase_prefix: last term is a prefix)
# --------------------------------------------------------------------------

_MPP_FIRST = "value"
_MPP_PREFIX = "ta"

_MPP_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, w,
         list_filter(range(1, len(w) + 1),
                     j -> w[j] = '{_MPP_FIRST}') AS p1
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
SELECT doc_id,
       CAST(len(hits) AS INTEGER) AS n_phrases,
       CAST(list_min(hits) AS INTEGER) AS first_pos
FROM (
  SELECT doc_id,
         list_filter(p1, j -> j < len(w)
                          AND starts_with(w[j + 1], '{_MPP_PREFIX}')) AS hits
  FROM pos
)
WHERE len(hits) > 0
"""


@register("match_phrase_prefix", _MPP_ORACLE)
def match_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``match_phrase_prefix``: the search-as-you-type query —
    '{first} {prefix}...' matches docs where '{first}' is IMMEDIATELY
    followed by any token starting with '{prefix}' (slop 0; ES expands
    the trailing prefix against the index's term dictionary, here the
    expansion is the startswith test itself).  Reports the match count
    and the first phrase position per doc.

    Scan shape (the span_near contract): array_contains postings gate
    first, ONE position-extraction lambda, then one single-level filter
    lambda checks the successor token — positions never leave their
    row, and only two small ints per matched doc survive."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    pos = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.array_contains("w", _MPP_FIRST))
        .select(
            "doc_id",
            "w",
            F.expr(
                "filter(sequence(1, size(w)),"
                f" j -> element_at(w, j) = '{_MPP_FIRST}')"
            ).alias("p1"),
        )
    )
    hits = F.expr(
        f"filter(p1, j -> j < size(w)"
        f" AND startswith(element_at(w, j + 1), '{_MPP_PREFIX}'))"
    )
    return (
        pos.select("doc_id", hits.alias("hits"))
        .filter(F.size("hits") > 0)
        .select(
            "doc_id",
            F.size("hits").cast("int").alias("n_phrases"),
            F.array_min("hits").cast("int").alias("first_pos"),
        )
    )


# --------------------------------------------------------------------------
# combined_fields  (ES combined_fields: one BM25 over merged fields)
# --------------------------------------------------------------------------

# Term-centric semantics (Lucene's CombinedFieldQuery / BM25F with
# uniform saturation): per-field term frequencies and lengths are
# WEIGHT-SUMMED into one pseudo-field, then scored with ONE BM25 pass
# on the combined statistics — unlike multi_match/dis_max there is no
# per-field score to take a max over.
_CF_TERMS = ("table", "merge")
_CF_TITLE_TOKENS = 8  # "title" = the doc's first 8 tokens (mapping.json
# style multi-field of the same source text, as in multi_match_dismax)
_CF_W_TITLE = 2  # integer field weight: weighted tf/dl stay exact ints
_CF_TOPN = 10
_N_CF = len(_CF_TERMS)


def _cf_base_sql() -> str:
    tf = ", ".join(
        f"({_CF_W_TITLE} * len(list_filter(tw, x -> x = '{t_}'))"
        f" + len(list_filter(w, x -> x = '{t_}'))) AS tf{i}_c"
        for i, t_ in enumerate(_CF_TERMS)
    )
    return (
        "SELECT doc_id,\n"
        f"         ({_CF_W_TITLE} * len(list_filter(tw, x -> x <> ''))"
        " + len(list_filter(w, x -> x <> ''))) AS dl_c,\n"
        f"         {tf}\n"
        "  FROM (SELECT doc_id, w, list_slice(w, 1, "
        f"{_CF_TITLE_TOKENS}) AS tw\n"
        "        FROM (SELECT doc_id, string_split(text, ' ') AS w"
        " FROM documents))"
    )


_COMBINED_FIELDS_ORACLE = f"""
WITH base AS (
  {_cf_base_sql()}
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl_c) AS DOUBLE) / COUNT(*) AS avgdl_c,
         {", ".join(f"SUM(CASE WHEN tf{i}_c > 0 THEN 1 ELSE 0 END)"
                    f" AS df{i}_c" for i in range(_N_CF))}
  FROM base
), scored AS (
  SELECT doc_id,
         CAST({" + ".join(_contrib_sql(i, "_c") for i in range(_N_CF))}
           AS DOUBLE) AS score
  FROM base CROSS JOIN stats
  WHERE {" OR ".join(f"tf{i}_c > 0" for i in range(_N_CF))}
)
SELECT doc_id, score, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM scored
)
WHERE rk <= {_CF_TOPN}
"""


@register("combined_fields", _COMBINED_FIELDS_ORACLE)
def combined_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``combined_fields`` over (title^2, body): term-centric BM25
    where tf and dl are the WEIGHT-SUMMED per-field values (integer
    weights keep them exact), df counts docs matching the combined
    pseudo-field, and one BM25 pass scores the merged statistics — the
    semantic opposite of multi_match_dismax's per-field max.

    The contribution is the single-sourced certified formula
    (search._bm25_contrib, suffix "_c").  One staged tokenization
    feeds both fields; stats are a 1-row broadcast; the cut is
    TakeOrderedAndProject.  Zero data-sized shuffles."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", F.split("text", " ").alias("_w")
    ).select(
        "doc_id",
        F.col("_w").alias("w"),
        F.slice("_w", 1, _CF_TITLE_TOKENS).alias("tw"),
    )
    w, tw = F.col("w"), F.col("tw")
    nz = lambda x: x != ""  # noqa: E731
    base = staged.select(
        "doc_id",
        (
            _CF_W_TITLE * F.size(F.filter(tw, nz))
            + F.size(F.filter(w, nz))
        )
        .cast("bigint")
        .alias("dl_c"),
        *[
            (
                _CF_W_TITLE * F.size(F.filter(tw, _eq_term(t_)))
                + F.size(F.filter(w, _eq_term(t_)))
            ).alias(f"tf{i}_c")
            for i, t_ in enumerate(_CF_TERMS)
        ],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl_c").cast("double") / F.count("*")).alias("avgdl_c"),
        *[
            F.sum(F.when(F.col(f"tf{i}_c") > 0, 1).otherwise(0)).alias(
                f"df{i}_c"
            )
            for i in range(_N_CF)
        ],
    )
    score = bm25_score_col(_N_CF, "_c")
    any_match = F.lit(False)
    for i in range(_N_CF):
        any_match = any_match | (F.col(f"tf{i}_c") > 0)
    topk = (
        base.crossJoin(F.broadcast(stats))
        .filter(any_match)
        .select("doc_id", score.cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_CF_TOPN)
    )
    rk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return topk.select("doc_id", "score", rk.alias("rk"))


# --------------------------------------------------------------------------
# boosting_query  (ES boosting: demote-not-exclude via negative_boost)
# --------------------------------------------------------------------------

_BQ_TERMS = ("merge", "batch")  # positive clause (BM25 match)
_BQ_NEGATIVE = "slow"  # negative clause (term)
_BQ_NEG_BOOST = 0.2
_BQ_TOPN = 10
_N_BQ = len(_BQ_TERMS)

# custom base CTE: neg_hit is COMPUTED (not a documents column), so the
# shared bm25_base_sql(extra_cols=...) passthrough cannot emit it; the
# dl/tf text below is byte-identical to bm25_base_sql's
_BQ_BASE_SQL = (
    "SELECT doc_id, neg_hit,\n"
    "         len(list_filter(w, x -> x <> '')) AS dl,\n"
    "         "
    + ", ".join(
        f"len(list_filter(w, x -> x = '{t_}')) AS tf{i}"
        for i, t_ in enumerate(_BQ_TERMS)
    )
    + "\n  FROM (SELECT doc_id,\n"
    "               CASE WHEN list_contains(string_split(text, ' '),"
    f" '{_BQ_NEGATIVE}') THEN 1 ELSE 0 END AS neg_hit,\n"
    "               string_split(text, ' ') AS w FROM documents)"
)

_BOOSTING_ORACLE = f"""
WITH base AS (
  {_BQ_BASE_SQL}
), stats AS (
  {bm25_stats_sql(_N_BQ)}
), scored AS (
  SELECT doc_id, neg_hit,
         CAST(({" + ".join(_contrib_sql(i) for i in range(_N_BQ))})
           AS DOUBLE)
           * CASE WHEN neg_hit = 1 THEN {_BQ_NEG_BOOST}e0 ELSE 1.0e0 END
           AS score
  FROM base CROSS JOIN stats
  WHERE {" OR ".join(f"tf{i} > 0" for i in range(_N_BQ))}
)
SELECT doc_id, CAST(neg_hit AS INTEGER) AS demoted, score,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT doc_id, neg_hit, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM scored
)
WHERE rk <= {_BQ_TOPN}
"""


@register("boosting_query", _BOOSTING_ORACLE)
def boosting_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``boosting`` query: positive BM25 match on {terms}, and docs
    that ALSO match the negative term get their score multiplied by
    negative_boost={nb} — demotion without exclusion (the way ES
    down-ranks near-spam without losing recall).  The demotion factor
    multiplies the already-rounded certified score, so the product is
    one IEEE multiply — deterministic cross-engine.

    Plan: the shared BM25 base frame carries the negative-clause flag
    as an extra staged column (one tokenization pass total); stats are
    a 1-row broadcast; TakeOrderedAndProject cut."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    # neg_hit must ride the SAME staged tokenization as dl/tf — pass it
    # through bm25_base_frame's extra_cols by staging it onto the docs
    # frame first (split() would otherwise evaluate twice per row)
    flagged = docs.select(
        "doc_id",
        "text",
        F.array_contains(F.split("text", " "), _BQ_NEGATIVE)
        .cast("int")
        .alias("neg_hit"),
    )
    base = bm25_base_frame(flagged, _BQ_TERMS, extra_cols=("neg_hit",))
    stats = bm25_stats_frame(base, _N_BQ)
    score = bm25_score_col(_N_BQ)
    any_match = F.lit(False)
    for i in range(_N_BQ):
        any_match = any_match | (F.col(f"tf{i}") > 0)
    boosted = score.cast("double") * F.when(
        F.col("neg_hit") == 1, F.lit(_BQ_NEG_BOOST)
    ).otherwise(F.lit(1.0))
    topk = (
        base.crossJoin(F.broadcast(stats))
        .filter(any_match)
        .select("doc_id", "neg_hit", boosted.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BQ_TOPN)
    )
    rk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return topk.select(
        "doc_id",
        F.col("neg_hit").cast("int").alias("demoted"),
        "score",
        rk.alias("rk"),
    )


# --------------------------------------------------------------------------
# pinned_query  (ES pinned: promoted ids first, organic after)
# --------------------------------------------------------------------------

_PIN_IDS = (7, 3, 11)  # promoted doc_ids, IN RANKING ORDER
_PIN_TERM = "table"
_PIN_ORGANIC = 10

_PINNED_ORACLE = f"""
WITH base AS (
  {bm25_base_sql((_PIN_TERM,))}
), stats AS (
  {bm25_stats_sql(1)}
), organic AS (
  SELECT doc_id, score, rk FROM (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rk
    FROM (
      SELECT doc_id, CAST({_contrib_sql(0)} AS DOUBLE) AS score
      FROM base CROSS JOIN stats
      WHERE tf0 > 0
        AND doc_id NOT IN ({", ".join(str(i) for i in _PIN_IDS)})
    )
  ) WHERE rk <= {_PIN_ORGANIC}
)
SELECT doc_id, src, score, CAST(rk AS INTEGER) AS rk FROM (
  SELECT doc_id, 'pinned' AS src, CAST(NULL AS DOUBLE) AS score,
         list_position([{", ".join(str(i) for i in _PIN_IDS)}], doc_id)
           AS rk
  FROM documents
  WHERE doc_id IN ({", ".join(str(i) for i in _PIN_IDS)})
  UNION ALL
  SELECT doc_id, 'organic' AS src, score, rk + {len(_PIN_IDS)} AS rk
  FROM organic
)
"""


@register("pinned_query", _PINNED_ORACLE)
def pinned_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``pinned`` query: the promoted ids rank first IN THEIR GIVEN
    ORDER (scores suppressed — ES assigns them synthetic
    above-anything scores; null here, same on both engines), then the
    organic BM25 matches for '{term}' follow, excluding the pinned ids
    (ES dedups promoted docs out of the organic hits).

    Plan: the pinned arm is a broadcast-size IN-filter with a literal
    array_position rank (no shuffle); the organic arm is the certified
    BM25 scorer cut by TakeOrderedAndProject, with the rank window
    running on the bounded top-k frame (the allowlisted
    rank-after-top-k pattern); one union of two bounded frames."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    pin_arr = F.array(*[F.lit(i).cast("bigint") for i in _PIN_IDS])
    pinned = docs.filter(
        F.col("doc_id").isin(list(_PIN_IDS))
    ).select(
        "doc_id",
        F.lit("pinned").alias("src"),
        F.lit(None).cast("double").alias("score"),
        F.array_position(pin_arr, F.col("doc_id")).cast("int").alias("rk"),
    )
    base = bm25_base_frame(docs, (_PIN_TERM,))
    stats = bm25_stats_frame(base, 1)
    topk = (
        base.crossJoin(F.broadcast(stats))
        .filter((F.col("tf0") > 0) & ~F.col("doc_id").isin(list(_PIN_IDS)))
        .select("doc_id", _bm25_contrib(0).cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_PIN_ORGANIC)
    )
    rk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    organic = topk.select(
        "doc_id",
        F.lit("organic").alias("src"),
        "score",
        (rk + len(_PIN_IDS)).cast("int").alias("rk"),
    )
    return pinned.unionByName(organic)


# --------------------------------------------------------------------------
# span_first_or_query  (ES span_first wrapping a span_or)
# --------------------------------------------------------------------------

_SF_TERMS = ("slow", "fast")
_SF_END = 10  # span_first: match must END at position <= 10 (1-based)

_SPAN_FIRST_ORACLE = f"""
SELECT doc_id,
       CAST(len(hits) AS INTEGER) AS n_first_hits,
       CAST(list_min(hits) AS INTEGER) AS first_pos
FROM (
  SELECT doc_id,
         list_filter(range(1, least(len(w), {_SF_END}) + 1),
                     j -> w[j] = '{_SF_TERMS[0]}'
                       OR w[j] = '{_SF_TERMS[1]}') AS hits
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
WHERE len(hits) > 0
"""


@register("span_first_or_query", _SPAN_FIRST_ORACLE)
def span_first_or_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``span_first`` wrapping a ``span_or``: either of {terms}
    occurring with its span ending at position <= {end} (single-token
    spans, so end == position).  The Lucene idiom for "term appears
    near the start" — heads of crawl docs carry title/lede signal.

    Scan shape: only the first {end} positions are examined (the
    sequence is clamped BEFORE the lambda runs — O(end) per row, not
    O(len)); one single-level lambda, zero shuffle, two ints per
    matched doc."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    hits = F.expr(
        f"filter(sequence(1, least(size(w), {_SF_END})),"
        f" j -> element_at(w, j) = '{_SF_TERMS[0]}'"
        f" OR element_at(w, j) = '{_SF_TERMS[1]}')"
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .select("doc_id", hits.alias("hits"))
        .filter(F.size("hits") > 0)
        .select(
            "doc_id",
            F.size("hits").cast("int").alias("n_first_hits"),
            F.array_min("hits").cast("int").alias("first_pos"),
        )
    )
