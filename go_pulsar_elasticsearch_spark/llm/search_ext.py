"""ES search-surface parity, part 2: term suggester (did-you-mean),
query rescoring, and search_after keyset pagination.

The reference maintains a text index (mapping.json:24-31 dual-indexes
`name` as text+keyword) whose users run the full _search feature set
against it; these close three features the engine had not yet named:

  suggest_term_spellcheck — ES `term` suggester: for each input term
                            absent from the index, candidate vocabulary
                            terms within max_edits=2 (prefix_length=1),
                            ranked by (edit distance, doc frequency).
  search_rescore          — ES `rescore`: re-rank only the top
                            `window_size` BM25 hits with a secondary
                            score, blended as query_weight * bm25 +
                            rescore_query_weight * secondary.
  search_after_page       — ES `search_after`: stateless deep
                            pagination by keyset predicate instead of
                            from+size skip.

100 TB posture: the suggester's candidate join is vocabulary x query
(the corpus never re-scans per term — the vocab frame is Heaps-bounded
and the query set is a broadcast literal); rescore touches exactly
window_size rows past the base top-k (TakeOrderedAndProject, no global
sort); search_after's keyset predicate is sargable — with a client-held
cursor literal it pushes into the scan, which is the entire point of
search_after over from+size (ES refuses from+size past 10k for the same
reason a 100 TB scan-and-skip is wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.search import (
    _QUERY_TERMS,
    bm25_base_frame,
    bm25_base_sql,
    bm25_score_col,
    bm25_score_sql,
    bm25_stats_frame,
    bm25_stats_sql,
)
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# suggest_term_spellcheck  (ES term suggester: did-you-mean candidates)
# --------------------------------------------------------------------------

# ES term-suggester defaults mirrored here: max_edits=2, prefix_length=1
# (candidates must share the first character — the trie walk ES does),
# size=3 per input term, candidates ranked by ascending edit distance
# then descending document frequency (suggest_mode=missing: the inputs
# are typos absent from the index).
_SUGGEST_INPUTS = ("sprak", "windoo", "tabel")
_SUGGEST_MAX_EDITS = 2
_SUGGEST_SIZE = 3

_SUGGEST_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks WHERE tok <> '' GROUP BY 1
), q AS (
  SELECT unnest({list(_SUGGEST_INPUTS)}) AS input_term
), cand AS (
  SELECT input_term, tok AS suggestion,
         CAST(levenshtein(input_term, tok) AS INTEGER) AS dist, df
  FROM q CROSS JOIN vocab
  WHERE substr(tok, 1, 1) = substr(input_term, 1, 1)
    AND levenshtein(input_term, tok) <= {_SUGGEST_MAX_EDITS}
)
SELECT input_term, suggestion, dist, df, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY input_term ORDER BY dist, df DESC, suggestion) AS rk
  FROM cand
)
WHERE rk <= {_SUGGEST_SIZE}
"""


@register("suggest_term_spellcheck", _SUGGEST_ORACLE)
def suggest_term_spellcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``term`` suggester: for each misspelled input term, the top-3
    vocabulary terms within edit distance 2 that share its first
    character (prefix_length=1), ranked by distance then document
    frequency — the did-you-mean box over the index the reference
    feeds.

    Plan: the (token, df) vocabulary is ONE exploded aggregate whose
    output is Heaps-bounded (vocabulary-sized, not corpus-sized); the
    candidate generation is vocab x broadcast-literal query terms with
    the prefix gate pruning before the Levenshtein evaluation; the
    per-term top-3 window partitions on the query term (Q partitions of
    candidate-sized rows).  The corpus is scanned exactly once."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    vocab = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    q = spark.createDataFrame(
        [(s,) for s in _SUGGEST_INPUTS], "input_term string"
    )
    dist = F.levenshtein("input_term", "tok")
    cand = (
        vocab.crossJoin(F.broadcast(q))
        .filter(
            (F.substring("tok", 1, 1) == F.substring("input_term", 1, 1))
            & (dist <= _SUGGEST_MAX_EDITS)
        )
        .select(
            "input_term",
            F.col("tok").alias("suggestion"),
            dist.cast("int").alias("dist"),
            "df",
        )
    )
    w = Window.partitionBy("input_term").orderBy(
        "dist", F.desc("df"), "suggestion"
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SUGGEST_SIZE)
    )


# --------------------------------------------------------------------------
# suggest_phrase  (ES phrase suggester: bigram-LM re-ranked corrections)
# --------------------------------------------------------------------------

# The `phrase` suggester is the term suggester's whole-query upgrade:
# per-position candidates come from the same edit-distance generator,
# but the RANKING is a language model over the index's own bigrams —
# "sprak tabel" should correct to "spark table" not "spark tale"
# because the corpus says so.  ES's default smoothing is Stupid Backoff
# (alpha = 0.4): S(w2|w1) = count(w1 w2)/count(w1) when the bigram is
# attested, else 0.4 * count(w2)/N — no discounting, which is exactly
# what makes it exact-arithmetic certifiable here (the shipped KN op,
# llm/lm_score.py, carries the discounted variant for scoring).  Each
# ln() is rounded to 6 before the sum, the round-6 recipe every LM op
# in this repo uses for cross-engine determinism.
# both positions are genuinely ambiguous over the fixture vocabulary
# ('sar' -> spark/sort/scan, 'sot' -> sort/slow), so the bigram LM — not
# the edit distance — decides the ranking across the 6 phrase candidates
_PHRASE_INPUT = ("sar", "sot")
_PHRASE_SIZE = 5
_SB_ALPHA = 0.4

_SUGGEST_PHRASE_ORACLE = f"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
), uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks
), arr AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), bi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
    SELECT w[i] AS w1, w[i + 1] AS w2
    FROM (SELECT w, unnest(range(1, len(w))) AS i
          FROM arr WHERE len(w) >= 2)
  ) GROUP BY w1, w2
), cand1 AS (
  SELECT tok AS t1, CAST(levenshtein('{_PHRASE_INPUT[0]}', tok) AS INTEGER)
           AS d1, c AS c1
  FROM uni
  WHERE substr(tok, 1, 1) = substr('{_PHRASE_INPUT[0]}', 1, 1)
    AND levenshtein('{_PHRASE_INPUT[0]}', tok) <= {_SUGGEST_MAX_EDITS}
), cand2 AS (
  SELECT tok AS t2, CAST(levenshtein('{_PHRASE_INPUT[1]}', tok) AS INTEGER)
           AS d2, c AS cu2
  FROM uni
  WHERE substr(tok, 1, 1) = substr('{_PHRASE_INPUT[1]}', 1, 1)
    AND levenshtein('{_PHRASE_INPUT[1]}', tok) <= {_SUGGEST_MAX_EDITS}
), scored AS (
  SELECT t1 || ' ' || t2 AS suggestion, d1 + d2 AS dist,
         round(ln(CAST(c1 AS DOUBLE) / n_tok), 6)
         + round(ln(CASE WHEN bi.c2 IS NOT NULL
                         THEN CAST(bi.c2 AS DOUBLE) / c1
                         ELSE {_SB_ALPHA} * CAST(cu2 AS DOUBLE) / n_tok
                    END), 6) AS score
  FROM cand1 CROSS JOIN cand2 CROSS JOIN n
  LEFT JOIN bi ON bi.w1 = t1 AND bi.w2 = t2
)
SELECT suggestion, CAST(dist AS INTEGER) AS dist, score,
       CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY score DESC, suggestion) AS rk
      FROM scored)
WHERE rk <= {_PHRASE_SIZE}
"""


@register("suggest_phrase", _SUGGEST_PHRASE_ORACLE)
def suggest_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``phrase`` suggester for the two-word misspelling
    'sprak tabel': per-position candidates within edit distance 2
    sharing the first character (the term suggester's generator), each
    whole-phrase candidate scored by a Stupid-Backoff bigram LM built
    from the corpus itself — ln P(c1) + ln S(c2|c1) — and the top 5
    returned.  An attested bigram beats any backoff pair, so the
    corpus's own collocations pick the correction.

    Plan: the unigram and bigram count frames are vocabulary-sized
    aggregates (one exploded pass each over the same scan); candidate
    generation prunes the vocab frame with the prefix gate before
    Levenshtein; the candidate cross product is tiny (edit-bounded) and
    both sides broadcast; the bigram lookup is a LEFT join against the
    vocabulary-sized bigram frame.  The corpus never re-scans per
    candidate."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n = toks.agg(F.count("*").alias("n_tok"))
    arr = docs.select(
        F.expr("filter(split(text, ' '), x -> x != '')").alias("w")
    )
    bi = (
        arr.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> struct(w[i] AS w1, w[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .groupBy("p.w1", "p.w2")
        .agg(F.count("*").alias("c2"))
    )

    def cand(term: str, pos: int):
        d = F.levenshtein(F.lit(term), F.col("tok"))
        return (
            uni.filter(
                (F.substring("tok", 1, 1) == term[0])
                & (d <= _SUGGEST_MAX_EDITS)
            )
            .select(
                F.col("tok").alias(f"t{pos}"),
                d.cast("int").alias(f"d{pos}"),
                F.col("c").alias("c1" if pos == 1 else "cu2"),
            )
        )

    backoff = (
        F.lit(_SB_ALPHA) * F.col("cu2").cast("double") / F.col("n_tok")
    )
    seen = F.col("c2").cast("double") / F.col("c1")
    score = (
        F.round(F.log(F.col("c1").cast("double") / F.col("n_tok")), 6)
        + F.round(F.log(F.coalesce(seen, backoff)), 6)
    )
    scored = (
        cand(_PHRASE_INPUT[0], 1)
        .crossJoin(F.broadcast(cand(_PHRASE_INPUT[1], 2)))
        .crossJoin(F.broadcast(n))
        .join(
            bi,
            (F.col("w1") == F.col("t1")) & (F.col("w2") == F.col("t2")),
            "left",
        )
        .select(
            F.concat_ws(" ", "t1", "t2").alias("suggestion"),
            (F.col("d1") + F.col("d2")).cast("int").alias("dist"),
            score.alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), "suggestion")
    return (
        scored.orderBy(F.desc("score"), "suggestion")
        .limit(_PHRASE_SIZE)
        .withColumn("rk", F.row_number().over(w))
    )


# --------------------------------------------------------------------------
# search_rescore  (ES rescore: window-bounded secondary re-ranking)
# --------------------------------------------------------------------------

# ES rescore semantics: only the top `window_size` hits of the base
# query are re-scored; final = query_weight * base + rescore_query_weight
# * secondary.  The secondary here is term coverage (how many distinct
# query terms the doc contains) — the cheap proxy for the expensive
# phrase/proximity rescorers ES users attach.
_RESCORE_WINDOW = 50
_RESCORE_QW = 1.0
_RESCORE_RW = 0.25
_RESCORE_SIZE = 10

_RESCORE_ORACLE = f"""
WITH base AS (
  {bm25_base_sql(_QUERY_TERMS)}
), stats AS (
  {bm25_stats_sql(len(_QUERY_TERMS))}
), scored AS (
  SELECT doc_id,
         CAST({bm25_score_sql(len(_QUERY_TERMS))} AS DOUBLE) AS bm25,
         CAST({" + ".join(
             f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END"
             for i in range(len(_QUERY_TERMS))
         )} AS INTEGER) AS n_matched
  FROM base CROSS JOIN stats
  WHERE {" OR ".join(f"tf{i} > 0" for i in range(len(_QUERY_TERMS)))}
), windowed AS (
  SELECT doc_id, bm25, n_matched
  FROM (
    SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS wrk
    FROM scored
  )
  WHERE wrk <= {_RESCORE_WINDOW}
)
SELECT doc_id, bm25, n_matched, score, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT doc_id, bm25, n_matched,
         {_RESCORE_QW} * bm25 + {_RESCORE_RW} * n_matched AS score,
         row_number() OVER (
           ORDER BY {_RESCORE_QW} * bm25 + {_RESCORE_RW} * n_matched DESC,
                    doc_id) AS rk
  FROM windowed
)
WHERE rk <= {_RESCORE_SIZE}
"""


@register("search_rescore", _RESCORE_ORACLE)
def search_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rescore``: the top-50 BM25 window re-ranked by the blended
    score query_weight*bm25 + rescore_query_weight*coverage, returning
    the top-10.  Docs outside the window are never re-scored — ES's
    contract, and the scale contract too: the expensive secondary
    scorer touches exactly window_size rows.

    The BM25 side reuses the single-sourced contribution formula
    (search._bm25_contrib — the certified bm25_search recipe verbatim),
    so base scores cannot drift from the certified op.  Both rank cuts
    are orderBy().limit() = TakeOrderedAndProject; the blend arithmetic
    is one multiply-add on doubles (0.25 * int is exact), bit-identical
    cross-engine."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    n_terms = len(_QUERY_TERMS)
    base = bm25_base_frame(docs, _QUERY_TERMS)
    stats = bm25_stats_frame(base, n_terms)
    bm25 = bm25_score_col(n_terms)
    coverage = F.when(F.col("tf0") > 0, 1).otherwise(0)
    for i in range(1, n_terms):
        coverage = coverage + F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(" OR ".join(f"tf{i} > 0" for i in range(n_terms)))
        .select(
            "doc_id",
            bm25.cast("double").alias("bm25"),
            coverage.cast("int").alias("n_matched"),
        )
    )
    windowed = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(
        _RESCORE_WINDOW
    )
    blended = F.lit(_RESCORE_QW) * F.col("bm25") + F.lit(_RESCORE_RW) * F.col(
        "n_matched"
    )
    topk = (
        windowed.select("doc_id", "bm25", "n_matched", blended.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_RESCORE_SIZE)
    )
    rk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return topk.select("doc_id", "bm25", "n_matched", "score", rk.alias("rk"))


# --------------------------------------------------------------------------
# search_after_page  (ES search_after: stateless keyset deep pagination)
# --------------------------------------------------------------------------

# Page 3 of a (n_chars DESC, doc_id ASC)-sorted listing, page size 10:
# the cursor is the sort key of the last hit of page 2 (global rank
# 20), and the page is the first 10 rows strictly AFTER the cursor in
# sort order — the keyset predicate ES's search_after evaluates instead
# of scanning-and-skipping `from` rows.
_SA_CURSOR_RANK = 20
_SA_PAGE = 10

_SEARCH_AFTER_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
), cur AS (
  SELECT n_chars AS c_chars, doc_id AS c_doc
  FROM ranked WHERE rk = {_SA_CURSOR_RANK}
)
SELECT doc_id, n_chars
FROM documents CROSS JOIN cur
WHERE n_chars < c_chars OR (n_chars = c_chars AND doc_id > c_doc)
ORDER BY n_chars DESC, doc_id
LIMIT {_SA_PAGE}
"""


@register("search_after_page", _SEARCH_AFTER_ORACLE)
def search_after_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``search_after``: page 3 (size 10) of the corpus sorted by
    (n_chars DESC, doc_id) — fetched by keyset predicate from the last
    hit of page 2, never by from+size skip.

    The cursor here is derived in-plan (rank-20 row via two nested
    TakeOrderedAndProject cuts over a 20-row frame) so the op is
    self-contained and certifiable; a real client holds the cursor as a
    LITERAL from the previous page's response, making the keyset
    predicate sargable — it pushes into the parquet scan and the page
    costs top-k over the surviving rows.  That is why ES caps from+size
    at 10k and offers search_after instead, and why scan-and-skip is
    wrong at 100 TB."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    top = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(_SA_CURSOR_RANK)
    )
    # the LAST row of the cursor page = first row under the reversed sort
    cursor = (
        top.orderBy(F.asc("n_chars"), F.desc("doc_id"))
        .limit(1)
        .select(
            F.col("n_chars").alias("c_chars"), F.col("doc_id").alias("c_doc")
        )
    )
    after = (F.col("n_chars") < F.col("c_chars")) | (
        (F.col("n_chars") == F.col("c_chars"))
        & (F.col("doc_id") > F.col("c_doc"))
    )
    return (
        docs.crossJoin(F.broadcast(cursor))
        .filter(after)
        .select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(_SA_PAGE)
    )


# --------------------------------------------------------------------------
# span_near_query  (Lucene span_near: proximity with slop, unordered)
# --------------------------------------------------------------------------

# span_near semantics (in_order=false): the two terms co-occur with at
# most `slop` intervening tokens — |pos_a - pos_b| - 1 <= slop.  The
# ordered variant would constrain (pos_b - pos_a - 1) in [0, slop].
_SPAN_TERMS = ("data", "column")
_SPAN_SLOP = 3

_SPAN_NEAR_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
         list_filter(range(1, len(w) + 1),
                     j -> w[j] = '{_SPAN_TERMS[0]}') AS p1,
         list_filter(range(1, len(w) + 1),
                     j -> w[j] = '{_SPAN_TERMS[1]}') AS p2
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
SELECT doc_id, n_pairs FROM (
  SELECT doc_id,
         CAST(COALESCE(list_sum(list_transform(p1,
           x -> len(list_filter(p2, y -> abs(x - y) - 1 <= {_SPAN_SLOP})))),
           0) AS BIGINT) AS n_pairs
  FROM p
) WHERE n_pairs > 0
"""


@register("span_near_query", _SPAN_NEAR_ORACLE)
def span_near_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene ``span_near`` (in_order=false, slop=3): documents where
    the two terms co-occur within 3 intervening tokens, with the
    matching position-pair count — the proximity query between
    ``match`` (bag of words) and ``match_phrase`` (exact adjacency,
    cf. phrase_match).

    Scan shape: postings intersection first (array_contains gate), then
    per-row position arrays from one filter(sequence) pass — positions
    never leave their row; only the per-matched-doc pair COUNT (one
    long, map-side combined) crosses the wire.  This is how a 100 TB
    proximity scan should behave (Lucene intersects postings before
    walking positions per segment)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    # project the token array ONCE: referencing split() inside the
    # higher-order lambdas would re-split the text per position index
    # (no codegen subexpression elimination inside lambdas — measured
    # quadratic in tokens)
    # postings-intersection pre-filter (Lucene's order of operations:
    # intersect the term postings BEFORE walking positions): only docs
    # containing BOTH terms pay the O(len) position extraction — a
    # cheap early-exit array_contains pass gates the expensive
    # filter(sequence(...)), and docs failing it can produce no pairs,
    # so results are unchanged (measured ~2x at sf0.1; grows with the
    # corpus fraction lacking either term)
    pos = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(
        F.array_contains("w", _SPAN_TERMS[0])
        & F.array_contains("w", _SPAN_TERMS[1])
    ).select(
        "doc_id",
        F.expr(
            "filter(sequence(1, size(w)),"
            f" j -> element_at(w, j) = '{_SPAN_TERMS[0]}')"
        ).alias("p1"),
        F.expr(
            "filter(sequence(1, size(w)),"
            f" j -> element_at(w, j) = '{_SPAN_TERMS[1]}')"
        ).alias("p2"),
    )
    # pair counting: explode the (small, post-intersection) p1 array and
    # count partners with ONE single-level lambda per occurrence, then
    # re-aggregate per doc.  The previous row-local form — a nested
    # aggregate(p1, ..., filter(p2, ...)) — kept zero-shuffle but paid
    # the interpreted-HOF tax on the nested closure (all higher-order
    # functions are CodegenFallback; nesting them multiplied the cost):
    # measured 3.4 s -> 1.2 s at sf0.1 for this shape.  The groupBy
    # shuffle carries one long per MATCHED doc (map-side combined), which
    # is noise next to the scan at any scale.
    n_partners = F.expr(
        f"size(filter(p2, y -> abs(x - y) - 1 <= {_SPAN_SLOP}))"
    )
    return (
        pos.select("doc_id", F.explode("p1").alias("x"), "p2")
        .select("doc_id", n_partners.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_pairs"))
        .filter(F.col("n_pairs") > 0)
    )


# --------------------------------------------------------------------------
# termvectors_doc  (ES _termvectors: per-doc term stats + corpus stats)
# --------------------------------------------------------------------------

# ES `_termvectors` for a document returns, per term: term frequency,
# the token positions, and (with term_statistics=true) the corpus-wide
# document frequency and total term frequency.  Positions are emitted
# as a comma-joined string (deterministic, hash-friendly — ES returns
# an ordered array).
_TV_DOC_IDS = (1, 2, 3)

_TERMVECTORS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, tok, CAST(i AS INTEGER) AS pos
  FROM (
    SELECT doc_id, w[i] AS tok, i
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         unnest(range(1, len(w) + 1)) AS t(i)
  )
  WHERE tok <> ''
), corpus AS (
  SELECT tok,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
         CAST(COUNT(*) AS BIGINT) AS ttf
  FROM toks GROUP BY tok
)
SELECT t.doc_id, t.tok AS term,
       CAST(COUNT(*) AS BIGINT) AS tf,
       string_agg(CAST(t.pos AS VARCHAR), ',' ORDER BY t.pos) AS positions,
       ANY_VALUE(c.doc_freq) AS doc_freq,
       ANY_VALUE(c.ttf) AS ttf
FROM toks t JOIN corpus c ON c.tok = t.tok
WHERE t.doc_id IN {tuple(_TV_DOC_IDS)}
GROUP BY t.doc_id, t.tok
"""


@register("termvectors_doc", _TERMVECTORS_ORACLE)
def termvectors_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_termvectors`` (term_statistics=true) for a 3-doc id set:
    per (doc, term) the term frequency and ordered token positions,
    plus the corpus-wide document frequency and total term frequency —
    the per-document debugging/relevance API over the index the
    reference maintains.

    Plan: the requested docs' postings come from a PRUNED scan (the id
    IN-list pushes down — tf/positions never touch the rest of the
    corpus); only the corpus statistics take a full pass, and that
    aggregate is vocabulary-sized and map-side combined, then joined
    onto the requested docs' term set (broadcast-scale: |terms in 3
    docs|).  ES computes df the same way — from the whole shard,
    whatever doc you ask about."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", "tok", (F.col("pos0") + 1).cast("int").alias("pos"))
    )
    corpus = toks.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("doc_freq"),
        F.count("*").alias("ttf"),
    )
    mine = toks.filter(F.col("doc_id").isin(list(_TV_DOC_IDS)))
    tv = mine.groupBy("doc_id", "tok").agg(
        F.count("*").alias("tf"),
        F.array_join(F.sort_array(F.collect_list("pos")), ",").alias(
            "positions"
        ),
    )
    return (
        tv.join(corpus, "tok")
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            "tf",
            "positions",
            "doc_freq",
            "ttf",
        )
    )


# --------------------------------------------------------------------------
# suggest_completion  (ES completion suggester: weighted prefix match)
# --------------------------------------------------------------------------

# The third ES suggester: search-as-you-type.  ES backs it with an FST
# over (input, weight) pairs and returns the top-`size` completions of
# the typed prefix by weight.  Here the suggest field is the corpus
# vocabulary with document frequency as the weight — the "index the
# queries users type" deployment — and the FST's job (prefix lookup
# over a Heaps-bounded set) is a LIKE-prefix filter over the vocabulary
# frame, which Catalyst evaluates as a StartsWith predicate.
_COMPLETION_PREFIXES = ("s", "ta", "wi")
_COMPLETION_SIZE = 3

_SUGGEST_COMPLETION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS weight
  FROM toks WHERE tok <> '' GROUP BY 1
), q AS (
  SELECT unnest({list(_COMPLETION_PREFIXES)}) AS prefix
), cand AS (
  SELECT prefix, tok AS completion, weight
  FROM q JOIN vocab ON tok LIKE prefix || '%'
)
SELECT prefix, completion, weight, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY prefix ORDER BY weight DESC, completion) AS rk
  FROM cand
)
WHERE rk <= {_COMPLETION_SIZE}
"""


@register("suggest_completion", _SUGGEST_COMPLETION_ORACLE)
def suggest_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``completion`` suggester: for each typed prefix, the top-3
    vocabulary completions by document-frequency weight — the
    search-as-you-type box, completing the suggester trio (term /
    phrase / completion).

    Plan: the (token, df) vocabulary is the same Heaps-bounded exploded
    aggregate the other suggesters build; the prefix probe is a
    StartsWith predicate against a broadcast literal frame (at 100 TB
    the vocabulary frame is the FST analog — kept hot, corpus never
    re-scanned per keystroke); per-prefix top-3 is a tiny partitioned
    window."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    vocab = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count_distinct("doc_id").alias("weight"))
    )
    q = spark.createDataFrame(
        [(p,) for p in _COMPLETION_PREFIXES], "prefix string"
    )
    cand = vocab.join(
        F.broadcast(q), F.col("tok").startswith(F.col("prefix"))
    ).select("prefix", F.col("tok").alias("completion"), "weight")
    w = Window.partitionBy("prefix").orderBy(
        F.desc("weight"), "completion"
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _COMPLETION_SIZE)
        .select("prefix", "completion", "weight", F.col("rk").cast("int"))
    )


# --------------------------------------------------------------------------
# rank_feature_query  (ES rank_feature: static-signal relevance scoring)
# --------------------------------------------------------------------------

# ES's `rank_feature` query scores documents by a STATIC numeric signal
# (pagerank, url_length, freshness...) through one of three bounded
# monotone functions — saturation x/(x+k), log(a) = ln(1 + a*x),
# sigmoid x^e/(x^e + k^e) — so the signal can join a bool query without
# swamping the text score.  Feature here: the document length
# (n_chars), the classic quality prior.  All three functions are pure
# IEEE arithmetic over exact integers (one division, one ln — the
# round-6 recipe), so all three scores hash-certify; k is pinned to
# the corpus median length so saturation genuinely spans (0, 1).
_RF_K = 300.0        # saturation/sigmoid pivot
_RF_LOG_A = 0.01     # log scaling factor
_RF_SIG_E = 2.0      # sigmoid exponent
_RF_TOPK = 25

_RANK_FEATURE_ORACLE = f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       round(CAST(n_chars AS DOUBLE) / (n_chars + {_RF_K}), 6) AS sat,
       round(ln(1.0 + {_RF_LOG_A} * n_chars), 6) AS logf,
       round(CAST(n_chars AS DOUBLE) * n_chars
             / (CAST(n_chars AS DOUBLE) * n_chars + {_RF_K} * {_RF_K}), 6)
         AS sig
FROM documents
ORDER BY sat DESC, doc_id
LIMIT {_RF_TOPK}
"""


@register("rank_feature_query", _RANK_FEATURE_ORACLE)
def rank_feature_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rank_feature`` with all three scoring functions —
    saturation (the default, pivot k = corpus-typical length), log,
    and sigmoid (exponent 2 written as x*x/(x*x + k*k), exact without
    pow) — over the document-length quality prior, top-25 by the
    saturation score.

    Plan: three scan-fused arithmetic columns + TakeOrderedAndProject —
    the zero-shuffle shape a static-signal boost must have, because ES
    evaluates rank_feature per hit inside the WAND loop; a shuffle here
    would mean the prior is mis-modeled as an aggregate."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("double")
    sat = F.round(x / (F.col("n_chars") + F.lit(_RF_K)), 6)
    logf = F.round(F.log(F.lit(1.0) + F.lit(_RF_LOG_A) * F.col("n_chars")), 6)
    sig = F.round(x * x / (x * x + F.lit(_RF_K * _RF_K)), 6)
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            sat.alias("sat"),
            logf.alias("logf"),
            sig.alias("sig"),
        )
        .orderBy(F.desc("sat"), "doc_id")
        .limit(_RF_TOPK)
    )


# --------------------------------------------------------------------------
# distance_feature_query  (ES distance_feature: recency/proximity boost)
# --------------------------------------------------------------------------

# ES's `distance_feature` is rank_feature's dynamic sibling: the score
# decays with DISTANCE from a query-time origin — boost * pivot /
# (pivot + distance) — for dates (recency boost) and geo points.  Here
# the date form over the event stream: origin mid-January, pivot 7
# days, distance in whole seconds (|epoch(ts) - epoch(origin)| — exact
# integers, so the one division is the only float op and the score
# hash-certifies without rounding tricks... rounded to 6 anyway, house
# style).
_DF_ORIGIN = "2024-01-15 00:00:00"
_DF_PIVOT_S = 7 * 86400
_DF_BOOST = 2.0
_DF_TOPK = 25

_DISTANCE_FEATURE_ORACLE = f"""
SELECT event_id,
       CAST(abs(CAST(floor(epoch(ts)) AS BIGINT)
                - CAST(floor(epoch(TIMESTAMP '{_DF_ORIGIN}')) AS BIGINT))
            AS BIGINT) AS dist_s,
       round({_DF_BOOST} * {_DF_PIVOT_S}.0
             / ({_DF_PIVOT_S} + abs(CAST(floor(epoch(ts)) AS BIGINT)
                - CAST(floor(epoch(TIMESTAMP '{_DF_ORIGIN}')) AS BIGINT))),
             6) AS score
FROM events
ORDER BY score DESC, event_id
LIMIT {_DF_TOPK}
"""


@register("distance_feature_query", _DISTANCE_FEATURE_ORACLE)
def distance_feature_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``distance_feature`` over the event stream: score = boost *
    pivot / (pivot + |ts - origin|), the recency boost that lets "new"
    outrank "relevant-but-stale" inside a bool query, top-25 closest to
    the origin.

    Plan: one scan-fused integer-seconds distance + one division +
    TakeOrderedAndProject — zero shuffle, the same per-hit shape as
    rank_feature_query (ES evaluates both inside the WAND loop)."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    dist = F.abs(
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lit(_DF_ORIGIN).cast("timestamp"))
    )
    score = F.round(
        F.lit(_DF_BOOST) * F.lit(float(_DF_PIVOT_S))
        / (F.lit(_DF_PIVOT_S) + dist),
        6,
    )
    return (
        ev.select(
            "event_id",
            dist.cast("long").alias("dist_s"),
            score.alias("score"),
        )
        .orderBy(F.desc("score"), "event_id")
        .limit(_DF_TOPK)
    )
