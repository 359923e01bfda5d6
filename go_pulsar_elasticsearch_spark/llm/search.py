"""Full-text search parity with the reference's Elasticsearch sink.

The reference indexes every record into Elasticsearch precisely so users
can run keyword queries over it (`pkg/es/es.go:160-213` bulk-indexes;
`schema/es/mapping.json:13-31` dual-indexes `type`/`name` as `text` +
`.keyword` for exactly this).  These operators bring the two core ES
query shapes INTO the engine, so a reference user can run their search
without the round trip:

  bm25_search  — Lucene-style BM25 ranked keyword search (ES `match`)
  phrase_match — positional phrase query, slop 0 (ES `match_phrase`)

Both are deterministic and fully oracled: BM25's only transcendental
(the idf log) is rounded to 6 decimals per term before an exact decimal
sum, and the phrase scan is pure integer/array logic.

100 TB posture: the tf table is the classic inverted-index build — one
shuffle keyed on (doc, term), map-side combined; corpus stats and the
per-term df table are vocabulary-sized broadcasts.  phrase_match is a
ZERO-shuffle narrow pass (per-row array scan).  At real scale the top-k
window over scored docs becomes orderBy(...).limit(k), which Catalyst
executes as TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.caching import (
    cache_slot,
    checkpoint_slot,
)
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# bm25_search
# --------------------------------------------------------------------------

_QUERY_TERMS = ("spark", "join", "window")
_K1 = 1.2
_B = 0.75
_TOPN = 10

def _contrib_sql(i: int, suffix: str = "") -> str:
    # `suffix` scopes the stat columns to a FIELD (multi_match scorers
    # compute tf/dl/df/avgdl per field; n_docs is index-wide) — the
    # default keeps the single-field certified ops byte-identical
    tf, df = f"tf{i}{suffix}", f"df{i}{suffix}"
    dl, avgdl = f"dl{suffix}", f"avgdl{suffix}"
    return (
        f"CAST(CASE WHEN {tf} > 0 THEN round("
        f"ln(1 + (n_docs - {df} + 0.5) / ({df} + 0.5))"
        f" * {tf} * ({_K1} + 1)"
        f" / ({tf} + {_K1} * (1 - {_B} + {_B} * {dl} / {avgdl})), 6)"
        f" ELSE 0 END AS DECIMAL(18,6))"
    )


def _bm25_contrib(i: int, suffix: str = "") -> "F.Column":
    """Column twin of _contrib_sql — the ONE Spark-side source of the
    per-term BM25 contribution, shared by every op that scores with it
    (bm25_search, search_request_e2e, multi_match_dismax) so the
    certified formula cannot drift between them.  ``suffix`` scopes the
    stat columns to a field (see _contrib_sql)."""
    tf, df = F.col(f"tf{i}{suffix}"), F.col(f"df{i}{suffix}")
    raw = (
        F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        * tf * (_K1 + 1)
        / (tf + _K1 * (1 - _B + _B * F.col(f"dl{suffix}") / F.col(f"avgdl{suffix}")))
    )
    return F.when(tf > 0, F.round(raw, 6)).otherwise(F.lit(0)).cast(
        "decimal(18,6)"
    )


def _eq_term(term: str):
    # single-arg lambda factory: F.filter gives a 2-arg lambda the array
    # INDEX as its second argument, so the term must be a closure, not a
    # default parameter
    return lambda x: x == term


# ---- single-sourced BM25 scaffolding (shared by bm25_search,
# search_request_e2e, and search_ext.search_rescore): the per-term
# contribution formula was single-sourced first (_bm25_contrib /
# _contrib_sql); these extend that to the (dl, tf_i) base frame and the
# (n_docs, avgdl, df_i) index-statistics frame so tokenization or a df
# definition can never drift between the certified scorers either.


def bm25_base_frame(docs: DataFrame, terms, extra_cols=()) -> DataFrame:
    """The (doc_id, [extra_cols], dl, tf_i) frame every BM25 scorer
    starts from — one narrow pass, per-row array filters, no explode.
    The token array is STAGED once (multi-referenced aliases block
    CollapseProject): inlining the split would tokenize the text
    n_terms+1 times per row."""
    staged = docs.select(
        "doc_id", *extra_cols, F.split("text", " ").alias("_w")
    )
    w = F.col("_w")
    return staged.select(
        "doc_id",
        *extra_cols,
        F.size(F.filter(w, lambda x: x != "")).cast("bigint").alias("dl"),
        *[
            F.size(F.filter(w, _eq_term(t_))).alias(f"tf{i}")
            for i, t_ in enumerate(terms)
        ],
    )


def bm25_stats_frame(base: DataFrame, n_terms: int) -> DataFrame:
    """The 1-row index statistics (always over the FULL base frame —
    ES filter-context rule: filters prune the scored set, never the
    statistics)."""
    return base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(n_terms)
        ],
    )


def bm25_score_col(n_terms: int, suffix: str = "") -> "F.Column":
    """The summed per-term contribution chain (fixed left association);
    ``suffix`` scopes the stat columns to a field, like _bm25_contrib."""
    score = _bm25_contrib(0, suffix)
    for i in range(1, n_terms):
        score = score + _bm25_contrib(i, suffix)
    return score


def bm25_base_sql(terms, extra_cols=()) -> str:
    """Oracle twin of bm25_base_frame (the `base` CTE body)."""
    xc = "".join(f"{c}, " for c in extra_cols)
    tfs = ", ".join(
        f"len(list_filter(w, x -> x = '{t_}')) AS tf{i}"
        for i, t_ in enumerate(terms)
    )
    return (
        f"SELECT doc_id, {xc}\n"
        f"         len(list_filter(w, x -> x <> '')) AS dl,\n"
        f"         {tfs}\n"
        f"  FROM (SELECT doc_id, {xc}string_split(text, ' ') AS w"
        f" FROM documents)"
    )


def bm25_stats_sql(n_terms: int) -> str:
    """Oracle twin of bm25_stats_frame (the `stats` CTE body)."""
    dfs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(n_terms)
    )
    return (
        "SELECT COUNT(*) AS n_docs,\n"
        "         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,\n"
        f"         {dfs}\n"
        "  FROM base"
    )


def bm25_score_sql(n_terms: int) -> str:
    """Oracle twin of bm25_score_col."""
    return " + ".join(_contrib_sql(i) for i in range(n_terms))


_BM25_ORACLE = f"""
WITH base AS (
  {bm25_base_sql(_QUERY_TERMS)}
), stats AS (
  {bm25_stats_sql(len(_QUERY_TERMS))}
), scored AS (
  SELECT doc_id,
         CAST({bm25_score_sql(len(_QUERY_TERMS))}
           AS DOUBLE) AS score
  FROM base CROSS JOIN stats
  WHERE {" OR ".join(f"tf{i} > 0" for i in range(len(_QUERY_TERMS)))}
)
SELECT doc_id, score, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM scored
)
WHERE rk <= {_TOPN}
"""


@register("bm25_search", _BM25_ORACLE)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked keyword search (Lucene formula, k1=1.2, b=0.75) for a
    3-term query, top-10 docs — the ES `match` query the reference's
    users run against the index it maintains (mapping.json:24-31 makes
    `name` a `text` field for exactly this scoring).

    idf = ln(1 + (N - df + .5)/(df + .5)); each term's contribution is
    rounded to 6 decimals and the per-doc score is a fixed left-assoc
    decimal chain, so it is engine-portable.

    For a FIXED small query, term frequencies are per-row array filters
    — no explode, no inverted-index shuffle.  Whole plan: one narrow
    pass building (dl, tf_t), ONE scalar-stats exchange (N, avgdl, df_t
    — broadcast back), a narrow scoring pass, and TakeOrderedAndProject
    for the top-k.  The general-query form (terms as data) would use
    the exploded (doc, term) groupBy instead; see boilerplate_ngrams
    for that shape."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    n_terms = len(_QUERY_TERMS)
    base = bm25_base_frame(docs, _QUERY_TERMS)
    stats = bm25_stats_frame(base, n_terms)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(" OR ".join(f"tf{i} > 0" for i in range(n_terms)))
        .select(
            "doc_id", bm25_score_col(n_terms).cast("double").alias("score")
        )
    )
    # top-k via TakeOrderedAndProject (no global sort, no
    # single-partition window over the corpus), then rank the k rows
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(_TOPN)
    rk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return topk.select("doc_id", "score", rk.alias("rk"))


# --------------------------------------------------------------------------
# phrase_match
# --------------------------------------------------------------------------

_PHRASE = ("data", "column")

_PHRASE_ORACLE = f"""
SELECT doc_id, n_hits, first_pos
FROM (
  SELECT doc_id,
         CAST(len(list_filter(range(1, len(w)),
              i -> w[i] = '{_PHRASE[0]}' AND w[i+1] = '{_PHRASE[1]}'))
           AS BIGINT) AS n_hits,
         CAST(list_min(list_filter(range(1, len(w)),
              i -> w[i] = '{_PHRASE[0]}' AND w[i+1] = '{_PHRASE[1]}'))
           AS BIGINT) AS first_pos
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
WHERE n_hits > 0
"""


@register("phrase_match", _PHRASE_ORACLE)
def phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase query (ES `match_phrase`, slop 0): docs where the
    exact word sequence occurs, with occurrence count and first position.

    ZERO shuffle: the position scan is a per-row higher-order filter over
    the token array — at 100 TB this is a pure map over the corpus with
    the predicate pushed into one codegen'd projection (an inverted
    positional index would only beat it for highly selective phrases)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    # staged projections: the token array AND the hit-position array
    # each materialize once — inlining `w` into the lambda would
    # re-split the text per position index, and `hits` is consumed by
    # two expressions (size + min), which would double the whole scan
    # (multi-referenced aliases block CollapseProject, so this is real)
    # postings-intersection pre-filter (what Lucene does before touching
    # positions): only docs containing BOTH terms pay the O(len) position
    # scan — array_contains is a cheap early-exit pass, and the corpus
    # fraction holding both terms is small, so the expensive
    # filter(sequence(...)) runs on ~5% of rows.  Docs failing the
    # containment test can produce no hits, so results are unchanged.
    w_frame = docs.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.array_contains("w", _PHRASE[0]) & F.array_contains("w", _PHRASE[1])
    )
    hits = F.filter(
        F.sequence(F.lit(1), F.size("w") - 1),
        lambda i: (F.element_at(F.col("w"), i) == _PHRASE[0])
        & (F.element_at(F.col("w"), i + 1) == _PHRASE[1]),
    )
    return (
        w_frame.select("doc_id", hits.alias("hits"))
        .select(
            "doc_id",
            F.size("hits").cast("bigint").alias("n_hits"),
            F.array_min("hits").cast("bigint").alias("first_pos"),
        )
        .filter(F.col("n_hits") > 0)
    )


# --------------------------------------------------------------------------
# search_highlight  (ES highlight: snippet around the first term match)
# --------------------------------------------------------------------------

_HL_TERM = "spark"
_HL_CTX = 3  # words of context each side

_HIGHLIGHT_ORACLE = f"""
WITH hits AS (
  SELECT doc_id, w, list_position(w, '{_HL_TERM}') AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE list_position(w, '{_HL_TERM}') > 0
)
SELECT doc_id, CAST(pos AS INTEGER) AS pos,
  array_to_string(
    w[CASE WHEN pos - {_HL_CTX} > 1 THEN pos - {_HL_CTX} ELSE 1 END
      : CASE WHEN pos + {_HL_CTX} < len(w) THEN pos + {_HL_CTX} ELSE len(w) END],
    ' ') AS snippet
FROM hits
"""


@register("search_highlight", _HIGHLIGHT_ORACLE)
def search_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES-style highlighting: for docs matching the term, return the
    snippet of +/-3 words around the FIRST occurrence (1-based word
    position, like a positional index would give).  Zero shuffles — the
    whole thing is array expressions fused into the scan."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    hits = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .withColumn("pos", F.array_position("w", _HL_TERM).cast("int"))
        .filter(F.col("pos") > 0)
    )
    start = F.greatest(F.col("pos") - _HL_CTX, F.lit(1))
    end = F.least(F.col("pos") + _HL_CTX, F.size("w"))
    return hits.select(
        "doc_id",
        "pos",
        F.concat_ws(
            " ", F.slice("w", start, end - start + F.lit(1))
        ).alias("snippet"),
    )


# --------------------------------------------------------------------------
# percolate_match  (ES percolator: stored queries evaluated against docs)
# --------------------------------------------------------------------------

# (query_id, must_term, must_not_term, min_chars) — a term query with an
# optional negation and a length gate, the shape ES percolator stores.
_PERCO_QUERIES = [
    (1, "spark", None, 0),
    (2, "merge", "slow", 100),
    (3, "window", None, 150),
    (4, "hash", "scan", 0),
]

_PERCO_VALUES = ", ".join(
    f"({qid}, '{must}', "
    + ("NULL" if must_not is None else f"'{must_not}'")
    + f", {min_chars})"
    for qid, must, must_not, min_chars in _PERCO_QUERIES
)

_PERCO_ORACLE = f"""
WITH q(query_id, must_term, must_not_term, min_chars) AS (
  VALUES {_PERCO_VALUES}
), d AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents
)
SELECT d.doc_id, CAST(q.query_id AS INTEGER) AS query_id
FROM d JOIN q
  ON list_contains(d.w, q.must_term)
 AND (q.must_not_term IS NULL OR NOT list_contains(d.w, q.must_not_term))
 AND d.n_chars >= q.min_chars
"""


@register("percolate_match", _PERCO_ORACLE)
def percolate_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolator: the stored-query table is broadcast and evaluated
    per document — reverse search (docs stream, queries rest), the
    alerting primitive.  Zero data shuffles: the query set is constant
    size, the per-pair predicate is an array membership test fused into
    the scan; the streaming form is the identical join inside
    foreachBatch."""
    tune(spark)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.split("text", " ").alias("w")
    )
    q = spark.createDataFrame(
        _PERCO_QUERIES,
        "query_id int, must_term string, must_not_term string, min_chars int",
    )
    cond = (
        F.array_contains("w", F.col("must_term"))
        & (
            F.col("must_not_term").isNull()
            | ~F.coalesce(
                F.array_contains("w", F.col("must_not_term")), F.lit(False)
            )
        )
        & (F.col("n_chars") >= F.col("min_chars"))
    )
    return docs.join(F.broadcast(q), cond).select("doc_id", "query_id")


# --------------------------------------------------------------------------
# tfidf_doc_similarity  (sparse cosine: the lexical sibling of the dense
# embedding similarity ops — posting-list joins, never dense vectors)
# --------------------------------------------------------------------------

_TDS_NQ = 5     # query docs: doc_id < 5
_TDS_TOPK = 3

_TDS_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
  GROUP BY doc_id, term
), dfq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(round((1 + ln(tf.tf)) * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 6)
              AS DECIMAL(18,6)) AS wgt
  FROM tf JOIN dfq USING (term) CROSS JOIN n
), norms AS (
  SELECT doc_id,
         CAST(SUM(CAST(CAST(wgt AS DOUBLE) * CAST(wgt AS DOUBLE)
                       AS DECIMAL(18,12))) AS DOUBLE) AS n2
  FROM w GROUP BY doc_id
), dots AS (
  SELECT q.doc_id AS qid, c.doc_id AS cid,
         CAST(SUM(CAST(CAST(q.wgt AS DOUBLE) * CAST(c.wgt AS DOUBLE)
                       AS DECIMAL(18,12))) AS DOUBLE) AS dot
  FROM w q JOIN w c ON c.term = q.term AND c.doc_id <> q.doc_id
  WHERE q.doc_id < {_TDS_NQ}
  GROUP BY q.doc_id, c.doc_id
), scored AS (
  SELECT qid, cid, dot / sqrt(nq.n2 * nc.n2) AS cosine
  FROM dots
  JOIN norms nq ON nq.doc_id = qid
  JOIN norms nc ON nc.doc_id = cid
)
SELECT qid, cid, cosine, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
        AS rk FROM scored)
WHERE rk <= {_TDS_TOPK}
"""


@register("tfidf_doc_similarity", _TDS_ORACLE)
def tfidf_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical similarity: log-tf x idf weights, cosine via a
    POSTING-LIST self-join on term (docs sharing no term never pair) —
    the inverted-index-native sibling of similarity_topk's dense scan.
    Weights round their ln at 6 decimals into decimals, products
    accumulate as DECIMAL(18,12) — bit-identical cross-engine.  At
    scale the term join is the classic impact-ordered index shape:
    prune ultra-high-df terms first (they add pairs, not signal)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    wgt = F.round(
        (1 + F.log("tf"))
        * F.log(F.col("n_docs").cast("double") / F.col("df")),
        6,
    ).cast("decimal(18,6)")
    # the weight frame feeds FOUR consumers (norms, query side,
    # candidate side, join-back); slot-cache it so the tokenize ->
    # tf -> df -> idf pipeline runs once instead of per consumer
    # (was 20 shuffle exchanges in the uncached plan)
    w = checkpoint_slot(
        "tfidf_weights",
        tf.join(dfq, "term").crossJoin(F.broadcast(n)).select(
            "doc_id", "term", wgt.alias("wgt")
        ),
    )
    wd = F.col("wgt").cast("double")
    prod = (wd * wd).cast("decimal(18,12)")
    norms = w.groupBy("doc_id").agg(
        F.sum(prod).cast("double").alias("n2")
    )
    q = w.filter(F.col("doc_id") < _TDS_NQ).select(
        F.col("doc_id").alias("qid"), "term", F.col("wgt").alias("qw")
    )
    c = w.select(F.col("doc_id").alias("cid"), "term", F.col("wgt").alias("cw"))
    pair_prod = (
        F.col("qw").cast("double") * F.col("cw").cast("double")
    ).cast("decimal(18,12)")
    dots = (
        q.join(c, (q.term == c.term) & (F.col("cid") != F.col("qid")))
        .groupBy("qid", "cid")
        .agg(F.sum(pair_prod).cast("double").alias("dot"))
    )
    scored = (
        dots.join(norms.select(F.col("doc_id").alias("qid"), F.col("n2").alias("nq")), "qid")
        .join(norms.select(F.col("doc_id").alias("cid"), F.col("n2").alias("nc")), "cid")
        .select(
            "qid", "cid",
            (F.col("dot") / F.sqrt(F.col("nq") * F.col("nc"))).alias("cosine"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= _TDS_TOPK)
        .select("qid", "cid", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# search_field_collapse  (ES `collapse` + inner_hits on _search)
# --------------------------------------------------------------------------

# ES field collapsing: the result list carries ONE hit per value of the
# collapse field (deduplicating near-identical sources in the ranking),
# with `inner_hits` exposing the next best docs inside each collapsed
# group.  Relational form: rank within group, rank groups by their best
# hit, emit the top groups' top docs flagged by their in-group position.
_COLLAPSE_GROUPS = 5   # top collapsed groups returned
_COLLAPSE_INNER = 3    # hits exposed per group (1 lead + 2 inner)

_COLLAPSE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, n_chars AS score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
),
heads AS (
  SELECT source, score AS head_score,
         ROW_NUMBER() OVER (ORDER BY score DESC, source) AS grp_rank
  FROM scored WHERE rn = 1
)
SELECT s.source, h.grp_rank, s.rn AS hit_rank, s.doc_id,
       CAST(s.score AS BIGINT) AS score
FROM scored s JOIN heads h ON h.source = s.source
WHERE h.grp_rank <= {_COLLAPSE_GROUPS} AND s.rn <= {_COLLAPSE_INNER}
"""


@register("search_field_collapse", _COLLAPSE_ORACLE)
def search_field_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``collapse`` with ``inner_hits``: one ranked entry per source
    (groups ordered by their best hit's score), each exposing its top 3
    documents.  Two window passes over the same source-partitioned
    shuffle + a broadcast-sized join on the group heads — output is
    bounded by groups x inner_hits regardless of corpus size."""
    tune(spark)
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", F.col("n_chars").alias("score")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        ),
    )
    heads = (
        scored.filter(F.col("rn") == 1)
        .select("source", F.col("score").alias("head_score"))
        .withColumn(
            "grp_rank",
            F.row_number().over(
                Window.orderBy(F.desc("head_score"), F.asc("source"))
            ),
        )
        .filter(F.col("grp_rank") <= _COLLAPSE_GROUPS)
    )
    return (
        scored.filter(F.col("rn") <= _COLLAPSE_INNER)
        .join(F.broadcast(heads.select("source", "grp_rank")), "source")
        .select(
            "source",
            "grp_rank",
            F.col("rn").alias("hit_rank"),
            "doc_id",
            F.col("score").cast("bigint").alias("score"),
        )
    )


# --------------------------------------------------------------------------
# rare_terms_agg  (ES rare_terms aggregation — the long tail)
# --------------------------------------------------------------------------

# terms() finds heads; rare_terms finds the tail: terms appearing in at
# most `max_doc_count` documents (typo mining, anomaly vocabulary, PII
# needles).  ES bounds its memory with a CuckooFilter and accepts false
# negatives; over columnar storage the EXACT answer is one
# doc-frequency aggregate + a threshold filter, so the engine certifies
# exact results (same stance as percentile_ranks_agg vs t-digest).
_RARE_MAX_DF = 5  # the unigram vocabulary is tiny and saturated, so the
# rare tail lives in the SHINGLE terms (word bigrams) — the field a real
# mapping would index with a shingle analyzer for this agg

_RARE_ORACLE = f"""
WITH bg AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS w,
               unnest(range(1, len(string_split(text, ' ')))) AS i
        FROM documents)
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS doc_count
  FROM bg GROUP BY term
)
SELECT term, CAST(doc_count AS BIGINT) AS doc_count
FROM df WHERE doc_count <= {_RARE_MAX_DF}
"""


@register("rare_terms_agg", _RARE_ORACLE)
def rare_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rare_terms`` over the shingle (word-bigram) terms: terms in
    at most 5 documents, exact.  Distinct (term, doc) pairs collapse
    map-side before the vocabulary-bounded frequency aggregate; the
    threshold filter prunes to the tail.  Output is tail-sized, never
    corpus-sized."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    # token array projected ONCE: a split() reference inside the
    # transform lambda would re-split the text per shingle index
    # (quadratic — the span_near_query lesson)
    pairs = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select(
        "doc_id",
        F.explode(
            # guard: sequence(1, 0) = [1, 0] and slice(..., 0, 2) throws,
            # so a 1-word doc must yield an empty shingle array
            F.expr(
                "CASE WHEN size(w) >= 2 THEN"
                " transform(sequence(1, size(w) - 1),"
                " i -> concat_ws(' ', slice(w, i, 2)))"
                " ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("term"),
    ).distinct()
    return (
        pairs.groupBy("term")
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") <= _RARE_MAX_DF)
    )


# --------------------------------------------------------------------------
# search_request_e2e  (a COMPLETE ES _search request, one fused plan)
# --------------------------------------------------------------------------

# The request a reference user actually sends the index the pipeline
# maintains: scoring match + filter context + collapse + size, in one
# body.  Every component is an already-certified piece — the Query-DSL
# compiler (llm/query_dsl.py) builds the filter predicate, the BM25
# machinery above scores the match clause, search_field_collapse's
# window pattern dedups by group — and THIS op certifies their fusion
# as one Catalyst plan (the composition, not the parts, is where
# semantics drift: scoring stats must come from the full index while
# the filter prunes the scored set, exactly ES's filter-context rule).

_REQ_TERMS = ("spark", "join")
_REQ_SIZE = 10
_SEARCH_REQUEST = {
    "bool": {
        "must": [{"match": {"text": " ".join(_REQ_TERMS)}}],
        "filter": [
            {"term": {"lang": "en"}},
            {"range": {"n_chars": {"gte": 200}}},
        ],
    }
}


_SEARCH_REQ_ORACLE = f"""
WITH base AS (
  {bm25_base_sql(_REQ_TERMS, extra_cols=("source", "lang", "n_chars"))}
), stats AS (
  -- scoring statistics come from the FULL index, never the filtered
  -- set (ES filter-context semantics: filters prune, must scores)
  {bm25_stats_sql(len(_REQ_TERMS))}
), scored AS (
  SELECT doc_id, source,
         CAST({bm25_score_sql(len(_REQ_TERMS))} AS DOUBLE) AS score
  FROM base CROSS JOIN stats
  WHERE lang = 'en' AND n_chars >= 200
    AND {" AND ".join(f"tf{i} > 0" for i in range(len(_REQ_TERMS)))}
), collapsed AS (
  SELECT doc_id, source, score FROM (
    SELECT doc_id, source, score,
           row_number() OVER (
             PARTITION BY source ORDER BY score DESC, doc_id) AS grn
    FROM scored
  ) WHERE grn = 1
)
SELECT CAST(rk AS INTEGER) AS rk, source, doc_id, score FROM (
  SELECT doc_id, source, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM collapsed
)
WHERE rk <= {_REQ_SIZE}
"""


@register("search_request_e2e", _SEARCH_REQ_ORACLE)
def search_request_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A complete ES ``_search`` request as ONE fused Catalyst plan:
    ``bool.must match`` scored by BM25, ``bool.filter`` (term + range)
    compiled by the certified Query-DSL compiler and pushed into the
    scan, ``collapse`` on ``source``, ``size`` 10.

    The filter predicate comes from ``compile_query`` on the literal
    request dict — the same compiler certified by query_dsl_compile —
    so this op proves the DSL front-end composes with scoring: the
    match clause both FILTERS (all tokens present, our documented
    analyzed-match dialect) and SCORES, while filter-context clauses
    prune without touching the statistics (idf/avgdl are full-index,
    computed before the filter — ES semantics).

    Plan: one narrow pass builds (dl, tf_t) per doc; ONE scalar
    exchange for the index statistics (broadcast back); the filter +
    scoring pass is narrow; collapse + final rank are two windows, the
    second over the group-collapsed (sources-sized) frame.  At 100 TB
    the only data-sized exchange is the source-keyed collapse
    shuffle."""
    from go_pulsar_elasticsearch_spark.llm.query_dsl import compile_query

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    n_terms = len(_REQ_TERMS)
    # `text` stays in the base frame because compile_query's match
    # clause filters on it; the oracle's filter inlines tf_i > 0 instead
    base = bm25_base_frame(
        docs, _REQ_TERMS, extra_cols=("source", "lang", "n_chars", "text")
    )
    stats = bm25_stats_frame(base, n_terms)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(compile_query(_SEARCH_REQUEST))
        .select(
            "doc_id",
            "source",
            bm25_score_col(n_terms).cast("double").alias("score"),
        )
    )
    gw = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    collapsed = (
        scored.select(
            "doc_id", "source", "score", F.row_number().over(gw).alias("grn")
        )
        .filter(F.col("grn") == 1)
        .drop("grn")
    )
    # top-k via TakeOrderedAndProject over the group-collapsed frame
    # (the bm25_search pattern: no global-order window over the corpus;
    # the ranking window sees only the k retained rows)
    top = collapsed.orderBy(F.desc("score"), F.asc("doc_id")).limit(_REQ_SIZE)
    rk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return top.select(rk.alias("rk"), "source", "doc_id", "score")


# --------------------------------------------------------------------------
# search_request_aggs  (the same _search request's aggregations section)
# --------------------------------------------------------------------------

# An ES _search response carries hits AND aggregations; the two sections
# have different shapes, so the engine certifies them as a registered
# pair over the SAME request body: search_request_e2e returns the ranked
# hits, this op the aggregations — a terms bucket on source with a
# doc_count, an exact sum metric, and the derived avg, over the
# FILTER-CONTEXT doc set (aggregations see filtered docs; ES computes
# them post-filter, pre-collapse — collapse affects hits only).

_SEARCH_AGGS_ORACLE = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_chars) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
FROM (SELECT source, n_chars, lang,
             string_split(text, ' ') AS w FROM documents)
WHERE lang = 'en' AND n_chars >= 200
  AND {" AND ".join(f"list_contains(w, '{t_}')" for t_ in _REQ_TERMS)}
GROUP BY source
ORDER BY doc_count DESC, source
LIMIT {_REQ_SIZE}
"""


@register("search_request_aggs", _SEARCH_AGGS_ORACLE)
def search_request_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregations section of the same ``_search`` request
    search_request_e2e serves the hits for: a ``terms`` bucket agg on
    ``source`` (doc_count order, size-capped) with an exact sum metric
    and the derived average, computed over the FILTER-CONTEXT document
    set — the identical `compile_query(_SEARCH_REQUEST)` predicate, so
    the hits/aggs pair provably describes one result set.  Collapse
    touches hits only (ES semantics), hence no group-head dedup here.

    Plan: pushed-filter scan -> ONE map-side-combined aggregate on
    source -> TakeOrderedAndProject for the size cap.  avg derives from
    the exact integer sum and count (identical int division semantics
    on both engines), so the double hashes bit-exact without decimal
    carriers."""
    from go_pulsar_elasticsearch_spark.llm.query_dsl import compile_query

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(compile_query(_SEARCH_REQUEST))
        .groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .select(
            "source",
            "doc_count",
            "sum_chars",
            (F.col("sum_chars") / F.col("doc_count").cast("double")).alias(
                "avg_chars"
            ),
        )
        .orderBy(F.desc("doc_count"), "source")
        .limit(_REQ_SIZE)
    )
