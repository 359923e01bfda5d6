"""Hybrid retrieval + term-analytics parity with the reference's ES sink.

The reference maintains an Elasticsearch index (`pkg/es/es.go:160-213`,
`schema/es/mapping.json:13-31`) whose whole purpose is downstream search
and term analytics.  These operators bring three more ES query shapes
into the engine, alongside llm/search.py's `match`/`match_phrase`:

  rrf_hybrid_search — ES 8.x `rrf` retriever: reciprocal-rank fusion of
                      a BM25 keyword ranking and a kNN cosine ranking
  significant_terms — ES `significant_terms` aggregation (JLH score)
  more_like_this    — ES `more_like_this`: top idf terms of a query doc
                      select similar docs

All three are deterministic and fully oracled: every transcendental
(ln in idf/JLH) is rounded to 6 decimals before exact decimal sums, and
every ranking breaks ties on the id.

100 TB posture: BM25/cosine rankings collapse to top-k lists via
TakeOrderedAndProject (no global sort); the fusion join runs on two
k-row lists (broadcast, sub-kilobyte).  significant_terms is the classic
explode -> per-term conditional agg: ONE map-side-combinable shuffle
keyed on term, plus a scalar-stats broadcast.  more_like_this broadcasts
the 8-term query vocabulary against the (doc, term) posting pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.search import _BM25_ORACLE, bm25_search
from go_pulsar_elasticsearch_spark.llm.similarity import _DOT_EXPR, _DOT_SQL
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_DIM = 64

# --------------------------------------------------------------------------
# rrf_hybrid_search
# --------------------------------------------------------------------------

_RRF_K = 60          # ES default rank_constant
_RRF_DEPTH = 10      # rank window per retriever (reuses bm25's top-10)
_RRF_QVEC = 0        # query vector id (doc_id and vec_id align in fixtures)
_FINAL_K = 10

_RRF_ORACLE = f"""
WITH bm25 AS ({_BM25_ORACLE}),
norms AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
  GROUP BY vec_id
), q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = {_RRF_QVEC}
), dots AS (
  SELECT vec_id AS vid, {_DOT_SQL('qe', 'embedding')} AS dot
  FROM (
    SELECT q.qe, e.vec_id, e.embedding, unnest(range(1, {_DIM + 1})) AS i
    FROM q, embeddings e WHERE e.vec_id <> {_RRF_QVEC}
  )
  GROUP BY vec_id
), knn AS (
  SELECT vid, CAST(rk AS INTEGER) AS rk
  FROM (
    SELECT vid,
           row_number() OVER (ORDER BY dot / sqrt(nq.n2 * nv.n2) DESC, vid) AS rk
    FROM dots
    JOIN norms nv ON nv.vec_id = vid
    CROSS JOIN (SELECT n2 FROM norms WHERE vec_id = {_RRF_QVEC}) nq
  )
  WHERE rk <= {_RRF_DEPTH}
), fused AS (
  SELECT COALESCE(bm25.doc_id, knn.vid) AS id,
         bm25.rk AS bm25_rk,
         knn.rk AS knn_rk,
         CAST(COALESCE(CAST(round(1.0 / ({_RRF_K} + bm25.rk), 6) AS DECIMAL(18,6)),
                       CAST(0 AS DECIMAL(18,6)))
            + COALESCE(CAST(round(1.0 / ({_RRF_K} + knn.rk), 6) AS DECIMAL(18,6)),
                       CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score
  FROM bm25 FULL OUTER JOIN knn ON bm25.doc_id = knn.vid
)
SELECT id, bm25_rk, knn_rk, rrf_score, CAST(frk AS INTEGER) AS frk
FROM (SELECT *, row_number() OVER (ORDER BY rrf_score DESC, id) AS frk FROM fused)
WHERE frk <= {_FINAL_K}
"""


@register("rrf_hybrid_search", _RRF_ORACLE)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused with reciprocal-rank fusion
    (ES 8.x `rrf` retriever, rank_constant=60): BM25 top-10 (llm/search.py,
    same query terms) + exact-cosine kNN top-10 for one query vector,
    full-outer joined on the doc id, score = sum of 1/(60+rank).

    Plan shape: each retriever ends in TakeOrderedAndProject over its
    scoring pass, so the fusion join sees two ~k-row inputs — broadcast,
    no shuffle.  At 100 TB the per-retriever scans dominate and stay
    embarrassingly parallel; fusion cost is O(k)."""
    tune(spark)
    bm25 = bm25_search(spark, sf_dir).select(
        F.col("doc_id").alias("bid"), F.col("rk").alias("bm25_rk")
    )

    emb = t(spark, sf_dir, "embeddings")
    dot = F.expr(_DOT_EXPR.format(a="qe", b="embedding"))
    self_dot = F.expr(_DOT_EXPR.format(a="embedding", b="embedding"))
    norms = emb.select("vec_id", self_dot.alias("n2"))
    q = emb.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("embedding").alias("qe")
    )
    nq = norms.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("n2").alias("nq")
    )
    scored = (
        emb.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("vid"), dot.alias("dot"))
        .join(norms.select(F.col("vec_id").alias("vid"), F.col("n2").alias("nv")), "vid")
        .crossJoin(F.broadcast(nq))
        .select("vid", (F.col("dot") / F.sqrt(F.col("nq") * F.col("nv"))).alias("cos"))
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vid")).limit(_RRF_DEPTH)
    knn = topk.select(
        "vid",
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), F.asc("vid")))
        .alias("knn_rk"),
    )

    def rrf_leg(rk: F.Column) -> F.Column:
        return F.coalesce(
            F.round(1.0 / (_RRF_K + rk), 6).cast("decimal(18,6)"),
            F.lit(0).cast("decimal(18,6)"),
        )

    fused = (
        bm25.join(knn, bm25.bid == knn.vid, "full_outer")
        .select(
            F.coalesce("bid", "vid").alias("id"),
            "bm25_rk",
            "knn_rk",
            (rrf_leg(F.col("bm25_rk")) + rrf_leg(F.col("knn_rk")))
            .cast("double")
            .alias("rrf_score"),
        )
    )
    final = fused.orderBy(F.desc("rrf_score"), F.asc("id")).limit(_FINAL_K)
    frk = F.row_number().over(Window.orderBy(F.desc("rrf_score"), F.asc("id")))
    return final.select("id", "bm25_rk", "knn_rk", "rrf_score", frk.alias("frk"))


# --------------------------------------------------------------------------
# significant_terms
# --------------------------------------------------------------------------

_SIG_LANG = "en"     # foreground = english docs
_SIG_MIN_DF = 5      # ES shard_min_doc_count analog
_SIG_TOPN = 15

_SIG_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, lang, term
  FROM (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
    FROM documents
  )
  WHERE term <> ''
), per_term AS (
  SELECT term,
         CAST(SUM(CASE WHEN lang = '{_SIG_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS fg_df,
         COUNT(*) AS bg_df
  FROM toks GROUP BY term
), stats AS (
  SELECT SUM(CASE WHEN lang = '{_SIG_LANG}' THEN 1 ELSE 0 END) AS fg_n,
         COUNT(*) AS bg_n
  FROM documents
), scored AS (
  SELECT term, fg_df, bg_df,
         round((CAST(fg_df AS DOUBLE) / fg_n - CAST(bg_df AS DOUBLE) / bg_n)
               * ((CAST(fg_df AS DOUBLE) / fg_n) / (CAST(bg_df AS DOUBLE) / bg_n)),
               6) AS jlh
  FROM per_term CROSS JOIN stats
  WHERE fg_df >= {_SIG_MIN_DF}
    AND CAST(fg_df AS DOUBLE) / fg_n > CAST(bg_df AS DOUBLE) / bg_n
)
SELECT term, fg_df, bg_df, jlh, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY jlh DESC, term) AS rk FROM scored)
WHERE rk <= {_SIG_TOPN}
"""


@register("significant_terms", _SIG_ORACLE)
def significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `significant_terms` aggregation with the JLH heuristic:
    terms over-represented in a foreground set (lang='en') vs the whole
    corpus, scored (fgPct - bgPct) * (fgPct / bgPct), doc-frequency
    based (each doc counts a term once), min fg doc count 5, top-15.

    Plan shape: explode -> countDistinct per term is ONE shuffle keyed
    on term (Spark expands the two distinct aggs over the same child
    scan); the (fg_n, bg_n) scalar pair is a broadcast.  JLH's pure
    double arithmetic is IEEE-identical across engines; rounded to 6
    anyway to keep the hash contract uniform."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term") != "")
    )
    fg = F.col("lang") == _SIG_LANG
    per_term = toks.groupBy("term").agg(
        F.count_distinct(F.when(fg, F.col("doc_id"))).alias("fg_df"),
        F.count_distinct("doc_id").alias("bg_df"),
    )
    stats = docs.agg(
        F.sum(F.when(fg, 1).otherwise(0)).alias("fg_n"),
        F.count("*").alias("bg_n"),
    )
    fgp = F.col("fg_df").cast("double") / F.col("fg_n")
    bgp = F.col("bg_df").cast("double") / F.col("bg_n")
    scored = (
        per_term.crossJoin(F.broadcast(stats))
        .filter((F.col("fg_df") >= _SIG_MIN_DF) & (fgp > bgp))
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.round((fgp - bgp) * (fgp / bgp), 6).alias("jlh"),
        )
    )
    top = scored.orderBy(F.desc("jlh"), F.asc("term")).limit(_SIG_TOPN)
    rk = F.row_number().over(Window.orderBy(F.desc("jlh"), F.asc("term")))
    return top.select("term", "fg_df", "bg_df", "jlh", rk.alias("rk"))


# --------------------------------------------------------------------------
# significant_text  (free-text significant terms with duplicate-text
# filtering — the significant_terms sibling for unindexed body fields)
# --------------------------------------------------------------------------

# ES `significant_text` differs from `significant_terms` in two ways it
# documents explicitly: it re-analyzes free text per hit (no keyword
# field needed), and `filter_duplicate_text` strips near-duplicated
# sections (boilerplate, quoted chains) BEFORE counting so one viral
# paragraph can't mint fake significance.  The dedup here is the
# certified dup_span machinery: every token position covered by a
# corpus-duplicated 10-gram is excised (dup_span_remove's covered set),
# and term statistics run over the SURVIVING text only.  Foreground =
# docs matching the query term in their ORIGINAL text (query context,
# as in ES where significant_text runs under a search), background =
# the whole corpus; scoring = the same JLH heuristic as
# significant_terms.
_SIGTEXT_TERM = "spark"
_SIGTEXT_MIN_DF = 5
_SIGTEXT_TOPN = 15

_SIGTEXT_ORACLE = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, i,
         md5(list_aggr(w[i:i+9], 'string_agg', ' ')) AS h
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - 8)) AS i
    FROM words WHERE len(w) >= 10
  )
), freq AS (
  SELECT h, COUNT(*) AS n FROM grams GROUP BY h
), dups AS (
  SELECT doc_id, i FROM grams JOIN freq USING (h) WHERE n > 1
), covered AS (
  SELECT DISTINCT doc_id, i + d AS p
  FROM dups CROSS JOIN range(0, 10) t(d)
), positions AS (
  SELECT doc_id, p, w[p] AS word
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS p FROM words)
), toks AS (
  SELECT DISTINCT pos.doc_id, pos.word AS term
  FROM positions pos
  LEFT JOIN covered c ON c.doc_id = pos.doc_id AND c.p = pos.p
  WHERE c.p IS NULL AND pos.word <> ''
), fg AS (
  SELECT doc_id, list_contains(w, '{_SIGTEXT_TERM}') AS is_fg FROM words
), per_term AS (
  SELECT t.term,
         CAST(SUM(CASE WHEN f.is_fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_df,
         CAST(COUNT(*) AS BIGINT) AS bg_df
  FROM toks t JOIN fg f ON f.doc_id = t.doc_id
  GROUP BY t.term
), stats AS (
  SELECT SUM(CASE WHEN is_fg THEN 1 ELSE 0 END) AS fg_n,
         COUNT(*) AS bg_n
  FROM fg
), scored AS (
  SELECT term, fg_df, bg_df,
         round((CAST(fg_df AS DOUBLE) / fg_n - CAST(bg_df AS DOUBLE) / bg_n)
               * ((CAST(fg_df AS DOUBLE) / fg_n)
                  / (CAST(bg_df AS DOUBLE) / bg_n)),
               6) AS jlh
  FROM per_term CROSS JOIN stats
  WHERE fg_df >= {_SIGTEXT_MIN_DF}
    AND CAST(fg_df AS DOUBLE) / fg_n > CAST(bg_df AS DOUBLE) / bg_n
)
SELECT term, fg_df, bg_df, jlh, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY jlh DESC, term) AS rk FROM scored)
WHERE rk <= {_SIGTEXT_TOPN}
"""


@register("significant_text", _SIGTEXT_ORACLE)
def significant_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``significant_text`` (filter_duplicate_text=true): JLH-scored
    over-representation of free-text terms in the docs matching the
    query term, with corpus-duplicated spans excised before counting —
    the certified dup_span_remove transform feeds the term statistics,
    so boilerplate that appears across documents cannot inflate either
    frequency side.

    Plan: the dedup stage is dup_span_remove's (gram-hash shuffle, the
    word frame slot-cached); term stats are one distinct-exploded
    aggregate keyed on term (vocabulary-sized output); the (fg_n, bg_n)
    scalar pair broadcasts.  The foreground flag joins on doc_id —
    co-partitioned with the dedup output, no extra wide state."""
    from go_pulsar_elasticsearch_spark.llm.dedup import dup_span_remove_df

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    cleaned = dup_span_remove_df(docs).select("doc_id", "cleaned_text")
    fg = docs.select(
        "doc_id",
        F.array_contains(F.split("text", " "), _SIGTEXT_TERM).alias("is_fg"),
    )
    toks = (
        cleaned.join(fg, "doc_id")
        .select(
            "doc_id",
            "is_fg",
            F.explode(F.split("cleaned_text", " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    per_term = toks.groupBy("term").agg(
        F.sum(F.when(F.col("is_fg"), 1).otherwise(0)).alias("fg_df"),
        F.count("*").alias("bg_df"),
    )
    stats = fg.agg(
        F.sum(F.when(F.col("is_fg"), 1).otherwise(0)).alias("fg_n"),
        F.count("*").alias("bg_n"),
    )
    fgp = F.col("fg_df").cast("double") / F.col("fg_n")
    bgp = F.col("bg_df").cast("double") / F.col("bg_n")
    scored = (
        per_term.crossJoin(F.broadcast(stats))
        .filter((F.col("fg_df") >= _SIGTEXT_MIN_DF) & (fgp > bgp))
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.round((fgp - bgp) * (fgp / bgp), 6).alias("jlh"),
        )
    )
    top = scored.orderBy(F.desc("jlh"), F.asc("term")).limit(_SIGTEXT_TOPN)
    rk = F.row_number().over(Window.orderBy(F.desc("jlh"), F.asc("term")))
    return top.select("term", "fg_df", "bg_df", "jlh", rk.alias("rk"))


# --------------------------------------------------------------------------
# more_like_this
# --------------------------------------------------------------------------

_MLT_DOC = 1         # the "like" document
_MLT_MAX_TERMS = 8   # ES max_query_terms analog (default 25; 8 for fixtures)
_MLT_MIN_DF = 2      # ES min_doc_freq analog
_MLT_TOPN = 10

_MLT_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
), df AS (
  SELECT term, COUNT(*) AS df FROM toks GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
qterms AS (
  SELECT term,
         CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)), 6)
              AS DECIMAL(18,6)) AS idf
  FROM (
    SELECT t.term, df.df, n.n_docs,
           row_number() OVER (
             ORDER BY round(ln(1 + (n.n_docs - df.df + 0.5) / (df.df + 0.5)), 6)
               DESC, t.term) AS trk
    FROM toks t JOIN df USING (term) CROSS JOIN n
    WHERE t.doc_id = {_MLT_DOC} AND df.df >= {_MLT_MIN_DF}
  )
  WHERE trk <= {_MLT_MAX_TERMS}
), scored AS (
  SELECT t.doc_id,
         CAST(SUM(q.idf) AS DECIMAL(28,6)) AS score,
         COUNT(*) AS n_shared
  FROM toks t JOIN qterms q USING (term)
  WHERE t.doc_id <> {_MLT_DOC}
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(score AS DOUBLE) AS score, n_shared, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM scored)
WHERE rk <= {_MLT_TOPN}
"""


@register("more_like_this", _MLT_ORACLE)
def more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `more_like_this` query: take the 8 highest-idf terms of doc 1
    (min df 2), score every other doc by the summed idf of shared terms
    (each term once per doc), return the top-10 most-similar docs.

    Plan shape: the distinct (doc, term) posting pass + per-term df are
    the inverted-index build (one term-keyed shuffle, map-side
    combined); the 8-term query vocabulary is a broadcast against the
    posting list, then ONE doc-keyed agg.  idf's ln is rounded to 6
    decimals before the exact decimal sum."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("array_distinct(filter(split(text, ' '), x -> x != ''))")
        ).alias("term"),
    )
    df_tbl = toks.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    idf = F.round(
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)), 6
    ).cast("decimal(18,6)")
    trk = F.row_number().over(Window.orderBy(F.desc("idf"), F.asc("term")))
    qterms = (
        toks.filter(F.col("doc_id") == _MLT_DOC)
        .join(df_tbl, "term")
        .filter(F.col("df") >= _MLT_MIN_DF)
        .crossJoin(F.broadcast(n))
        .select("term", idf.alias("idf"))
        .withColumn("trk", trk)
        .filter(F.col("trk") <= _MLT_MAX_TERMS)
        .select("term", "idf")
    )
    scored = (
        toks.filter(F.col("doc_id") != _MLT_DOC)
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("idf").cast("decimal(28,6)").alias("score"),
            F.count("*").alias("n_shared"),
        )
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(_MLT_TOPN)
    rk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return top.select(
        "doc_id", F.col("score").cast("double").alias("score"), "n_shared", rk.alias("rk")
    )


# --------------------------------------------------------------------------
# autocomplete_prefix  (ES `prefix` query / completion suggester shape)
# --------------------------------------------------------------------------

_PREFIXES = ("c", "s", "b")
_AC_TOPN = 5

_AC_ORACLE = f"""
WITH df AS (
  SELECT term, COUNT(*) AS df
  FROM (
    SELECT DISTINCT doc_id, term
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
    WHERE term <> ''
  )
  GROUP BY term
), hits AS (
  SELECT p.prefix, d.term, d.df
  FROM (SELECT unnest(ARRAY{list(_PREFIXES)}) AS prefix) p
  JOIN df d ON d.term LIKE p.prefix || '%'
)
SELECT prefix, term, df, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT prefix, term, df,
         row_number() OVER (PARTITION BY prefix ORDER BY df DESC, term) AS rk
  FROM hits
)
WHERE rk <= {_AC_TOPN}
"""


@register("autocomplete_prefix", _AC_ORACLE)
def autocomplete_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `prefix` query / completion-suggester shape: for each query
    prefix, the 5 most-frequent index terms completing it (doc
    frequency, each doc counts a term once) — what a search box
    suggests as the user types.

    Plan shape: the (doc, term) posting pass + df agg is the shared
    inverted-index build (one term-keyed shuffle, map-side combined);
    the 3-row prefix table broadcasts against the vocabulary, and the
    per-prefix top-5 window runs on |prefixes| tiny groups.  At 100 TB
    a production suggester materializes the df table once (it is
    vocabulary-sized, millions of rows not billions) and serves point
    lookups from it; this op IS that build."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("array_distinct(filter(split(text, ' '), x -> x != ''))")
        ).alias("term"),
    )
    df_tbl = toks.groupBy("term").agg(F.count("*").alias("df"))
    prefixes = spark.createDataFrame(
        [(p,) for p in _PREFIXES], "prefix string"
    )
    hits = df_tbl.join(
        F.broadcast(prefixes), F.col("term").startswith(F.col("prefix"))
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _AC_TOPN)
        .select("prefix", "term", "df", "rk")
    )


# --------------------------------------------------------------------------
# wildcard_term_search  (ES `wildcard` query)
# --------------------------------------------------------------------------

_WILDCARD_SUFFIX = "er"  # pattern: *er

_WC_ORACLE = f"""
SELECT doc_id, n_hits, n_distinct_terms
FROM (
  SELECT doc_id,
         CAST(len(list_filter(w, x -> x LIKE '%{_WILDCARD_SUFFIX}'))
           AS BIGINT) AS n_hits,
         CAST(len(list_distinct(list_filter(w, x -> x LIKE '%{_WILDCARD_SUFFIX}')))
           AS BIGINT) AS n_distinct_terms
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
WHERE n_hits > 0
"""


@register("wildcard_term_search", _WC_ORACLE)
def wildcard_term_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `wildcard` query (pattern `*ion`): docs containing a matching
    term, with occurrence and distinct-term counts.

    ZERO shuffle: like phrase_match, the scan is a per-row higher-order
    filter over the token array — a pure codegen'd map over the corpus.
    This is exactly why ES warns wildcard queries are expensive (they
    walk the term dictionary); a columnar scan with predicate pushdown
    on adjacent filters is the 100 TB-friendly form."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    # stage the matched-term array once: it feeds two consumers (size +
    # distinct-size), which would otherwise each re-split and re-filter
    matched = F.filter(
        F.split("text", " "), lambda x: x.like(f"%{_WILDCARD_SUFFIX}")
    )
    return (
        docs.select("doc_id", matched.alias("m"))
        .select(
            "doc_id",
            F.size("m").cast("bigint").alias("n_hits"),
            F.size(F.array_distinct("m")).cast("bigint").alias(
                "n_distinct_terms"
            ),
        )
        .filter(F.col("n_hits") > 0)
    )


# --------------------------------------------------------------------------
# function_score  (ES function_score query: filter + multiplicative
# scoring functions + top-N by computed score)
# --------------------------------------------------------------------------

_FS_ORIGIN = "2024-07-01"
_FS_TOPN = 100

_FS_ORACLE = f"""
SELECT event_id, user_id,
       sqrt(value) AS value_factor,
       1.0 / (1.0 + abs(datediff('day', DATE '{_FS_ORIGIN}', CAST(ts AS DATE))))
         AS recency_decay,
       sqrt(value) *
       (1.0 / (1.0 + abs(datediff('day', DATE '{_FS_ORIGIN}', CAST(ts AS DATE)))))
         AS score
FROM events
WHERE event_type = 'click' AND value > 0
ORDER BY score DESC, event_id
LIMIT {_FS_TOPN}
"""


@register("function_score", _FS_ORACLE)
def function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `function_score`: a filter query re-scored by multiplicative
    functions — here field_value_factor(modifier: sqrt) on `value`
    times a reciprocal recency decay around a fixed origin date — and
    the top-N taken by the combined score.  sqrt and division are
    correctly-rounded IEEE ops, so the double scores are bit-identical
    cross-engine (exp/gauss decays are NOT — they vary by libm — which
    is why the decay here is the rational `1/(1+age)` form).

    Scale shape: narrow scan-side filter + projection, then global
    top-N = TakeOrderedAndProject (per-task heaps, driver merges N
    rows; no sort shuffle)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    age = F.abs(F.datediff(F.to_date("ts"), F.lit(_FS_ORIGIN).cast("date")))
    value_factor = F.sqrt("value")
    decay = F.lit(1.0) / (F.lit(1.0) + age)
    return (
        ev.filter((F.col("event_type") == "click") & (F.col("value") > 0))
        .select(
            "event_id",
            "user_id",
            value_factor.alias("value_factor"),
            decay.alias("recency_decay"),
            (value_factor * decay).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("event_id"))
        .limit(_FS_TOPN)
    )


# --------------------------------------------------------------------------
# ndcg_eval  (ranking-quality evaluation: nDCG@10 per query — the search
# family's missing EVAL metric; deterministic pseudo-rankings make the
# whole computation hash-certifiable)
# --------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_QUERIES = 19  # coprime with the rel modulus, so grades vary per query


def _ndcg_oracle() -> str:
    from go_pulsar_elasticsearch_spark.llm.lm_score import _md5_u32_sql

    return f"""
WITH scored AS (
  SELECT doc_id % {_NDCG_QUERIES} AS q, doc_id,
         {_md5_u32_sql('doc_id')} AS score,
         CAST(doc_id % 4 AS BIGINT) AS rel
  FROM documents
), ranked AS (
  SELECT q, rel,
         ROW_NUMBER() OVER (PARTITION BY q ORDER BY score DESC, doc_id) AS r
  FROM scored
), ideal AS (
  SELECT q, rel,
         ROW_NUMBER() OVER (PARTITION BY q ORDER BY rel DESC, doc_id) AS r
  FROM scored
), dcg AS (
  SELECT q, CAST(SUM(CAST(round((pow(2, rel) - 1) / log2(r + 1), 6)
                          AS DECIMAL(18,6))) AS DOUBLE) AS dcg
  FROM ranked WHERE r <= {_NDCG_K} GROUP BY q
), idcg AS (
  SELECT q, CAST(SUM(CAST(round((pow(2, rel) - 1) / log2(r + 1), 6)
                          AS DECIMAL(18,6))) AS DOUBLE) AS idcg
  FROM ideal WHERE r <= {_NDCG_K} GROUP BY q
)
SELECT CAST(d.q AS BIGINT) AS q, d.dcg, i.idcg,
       round(d.dcg / i.idcg, 6) AS ndcg_at_{_NDCG_K}
FROM dcg d JOIN idcg i ON i.q = d.q
"""


@register("ndcg_eval", _ndcg_oracle())
def ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per query bucket: a deterministic pseudo-retrieval
    (md5-u32 of doc_id as the system score) is evaluated against
    deterministic graded relevance (doc_id % 4), so DCG, ideal DCG and
    their ratio are all closed-form — the certification covers the
    metric arithmetic itself (the part eval harnesses get subtly wrong:
    gain = 2^rel - 1, log2 discounting, per-query ideal ordering).
    Each discount term rounds to 6 places BEFORE an exact decimal sum
    (sum order differs between engines; round-then-exact-sum is the
    house rule for transcendentals).

    Scale: two q-partitioned windows share one hash exchange; only
    rank <= 10 rows reach the per-query aggregate, so the output is
    queries x 1 regardless of corpus size — plug a real retriever's
    (q, doc, score) frame in and the same plan scores it."""
    tune(spark)
    docs = t(spark, sf_dir, "documents").select("doc_id")
    scored = docs.select(
        (F.col("doc_id") % _NDCG_QUERIES).alias("q"),
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("bigint").alias("score"),
        (F.col("doc_id") % 4).alias("rel"),
    )
    ranked_w = Window.partitionBy("q").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ideal_w = Window.partitionBy("q").orderBy(F.desc("rel"), F.asc("doc_id"))
    gain = F.pow(F.lit(2), F.col("rel")) - 1

    def _dcg(w, out):
        # round each transcendental TERM to 6 places, then sum exactly
        # as decimals (the house order-independence rule — a raw double
        # SUM's partition-merge order differs between engines)
        term = F.round(gain / F.log2(F.col("r") + 1), 6).cast(
            "decimal(18,6)"
        )
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= _NDCG_K)
            .groupBy("q")
            .agg(F.sum(term).cast("double").alias(out))
        )

    dcg = _dcg(ranked_w, "dcg")
    idcg = _dcg(ideal_w, "idcg")
    return dcg.join(idcg, "q").select(
        "q", "dcg", "idcg",
        F.round(F.col("dcg") / F.col("idcg"), 6).alias(f"ndcg_at_{_NDCG_K}"),
    )


# --------------------------------------------------------------------------
# rag_chunk_retrieval  (RAG retriever: chunk-level ANN with parent-doc
# collapse — the LangChain ParentDocumentRetriever / ES inner-hits shape)
# --------------------------------------------------------------------------

_RAG_DIMS = 8
_RAG_QUERY = "spark join window data column"
_RAG_TOPK = 10
# chunking reuses doc_chunk_overlap's certified geometry
_RAG_W, _RAG_S = 40, 30

_RAG_HEX = "0123456789abcdef"


def _rag_dim_sql(arr: str, i: int, instr_fn: str) -> str:
    """Dimension i of the hash-bucket embedding: how many tokens of
    ``arr`` hash (md5 first hex digit mod dims) into bucket i.  The
    deterministic, engine-shared stand-in for a learned embedding —
    the retrieval PLAN (chunk -> embed -> score -> collapse -> top-k)
    is what's being certified; swap in a real encoder at the embed
    step and nothing else changes."""
    return (
        f"size(filter({arr}, x -> ({instr_fn}('{_RAG_HEX}',"
        f" substring(md5(x), 1, 1)) - 1) % {_RAG_DIMS} = {i}))"
    )


def _rag_dim_duck(arr: str, i: int) -> str:
    return (
        f"len(list_filter({arr}, x -> (strpos('{_RAG_HEX}',"
        f" substr(md5(x), 1, 1)) - 1) % {_RAG_DIMS} = {i}))"
    )


def _rag_query_vec() -> list[int]:
    import hashlib

    vec = [0] * _RAG_DIMS
    for w in _RAG_QUERY.split(" "):
        if w:
            d = hashlib.md5(w.encode()).hexdigest()[0]
            vec[_RAG_HEX.index(d) % _RAG_DIMS] += 1
    return vec


_RAG_QV = _rag_query_vec()
_RAG_QN2 = sum(v * v for v in _RAG_QV)

_RAG_ORACLE = f"""
WITH chunks AS (
  SELECT doc_id,
         CAST(floor(s / {_RAG_S}) AS BIGINT) AS chunk_id,
         list_filter(list_slice(string_split(text, ' '),
                                s + 1, s + {_RAG_W}),
                     x -> x <> '') AS cw
  FROM (
    SELECT doc_id, text,
           unnest(range(0, len(string_split(text, ' ')), {_RAG_S})) AS s
    FROM documents
  )
), emb AS (
  SELECT doc_id, chunk_id,
         {", ".join(f"{_rag_dim_duck('cw', i)} AS d{i}"
                    for i in range(_RAG_DIMS))}
  FROM chunks
), scored AS (
  SELECT doc_id, chunk_id,
         ({" + ".join(f"d{i} * {_RAG_QV[i]}" for i in range(_RAG_DIMS))})
           / (sqrt(CAST({" + ".join(f"d{i} * d{i}"
                                    for i in range(_RAG_DIMS))} AS DOUBLE))
              * sqrt(CAST({_RAG_QN2} AS DOUBLE))) AS cos_sim
  FROM emb
  WHERE {" + ".join(f"d{i} * d{i}" for i in range(_RAG_DIMS))} > 0
), best AS (
  SELECT doc_id, chunk_id AS best_chunk_id, cos_sim,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY cos_sim DESC, chunk_id) AS ck
  FROM scored
)
SELECT doc_id, best_chunk_id, cos_sim AS score, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT doc_id, best_chunk_id, cos_sim,
         row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rk
  FROM best WHERE ck = 1
)
WHERE rk <= {_RAG_TOPK}
"""


@register("rag_chunk_retrieval", _RAG_ORACLE)
def rag_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG retrieval chain as ONE certified plan: sliding-window
    chunking (doc_chunk_overlap's 40/30 geometry) -> per-chunk
    embedding (deterministic hash-bucket token counts standing in for
    the encoder — the plan is what's certified; a Pandas-UDF encoder
    slots into the same column) -> cosine against the query vector ->
    PARENT-DOC COLLAPSE (each doc scored by its best chunk, the
    LangChain ParentDocumentRetriever / ES inner-hits pattern) ->
    top-10 docs with their best chunk id.

    Cross-engine exactness: dims and dot products are exact ints; the
    two sqrt/divide steps are one shared IEEE expression; ranking ties
    break on (chunk_id, doc_id).

    100 TB shape: chunk+embed are narrow (one scan, one generate,
    zero shuffle); the collapse is ONE map-side-combined max-struct
    per doc; the final cut is TakeOrderedAndProject.  At scale the
    brute-force cosine leg swaps for the certified IVF/PQ probes
    (llm/ann_index.py) with this same collapse tail."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    chunks = docs.select(
        "doc_id",
        words.alias("words"),
        F.explode(
            F.sequence(F.lit(0), F.size(words) - 1, F.lit(_RAG_S))
        ).alias("s"),
    ).select(
        "doc_id",
        F.floor(F.col("s") / _RAG_S).cast("bigint").alias("chunk_id"),
        F.expr(
            f"filter(slice(words, s + 1, {_RAG_W}), x -> x <> '')"
        ).alias("cw"),
    )
    emb = chunks.select(
        "doc_id",
        "chunk_id",
        *[
            F.expr(_rag_dim_sql("cw", i, "instr")).alias(f"d{i}")
            for i in range(_RAG_DIMS)
        ],
    )
    dot = " + ".join(f"d{i} * {_RAG_QV[i]}" for i in range(_RAG_DIMS))
    n2 = " + ".join(f"d{i} * d{i}" for i in range(_RAG_DIMS))
    scored = emb.filter(F.expr(f"{n2} > 0")).select(
        "doc_id",
        "chunk_id",
        F.expr(
            f"({dot}) / (sqrt(CAST({n2} AS DOUBLE))"
            f" * sqrt(CAST({_RAG_QN2} AS DOUBLE)))"
        ).alias("cos_sim"),
    )
    # parent collapse as ONE max-struct aggregate (no per-doc window
    # sort): cos DESC then chunk_id ASC == max(struct(cos, -chunk_id))
    best = (
        scored.groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cos_sim"), (-F.col("chunk_id")).alias("nck")
                )
            ).alias("m")
        )
        .select(
            "doc_id",
            (-F.col("m.nck")).cast("bigint").alias("best_chunk_id"),
            F.col("m.cos_sim").alias("score"),
        )
    )
    topk = best.orderBy(F.desc("score"), F.asc("doc_id")).limit(_RAG_TOPK)
    rk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return topk.select("doc_id", "best_chunk_id", "score", rk.alias("rk"))
