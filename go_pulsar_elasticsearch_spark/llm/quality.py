"""Corpus quality filtering and repeated-segment removal.

Three operators extending the text-hygiene family (quality_score,
doc_repetition_ratio, pii_scrub):

  gopher_quality_filter — the Gopher/MassiveText rule battery as
      explicit per-rule flags (word-count bounds, mean word length,
      symbol ratio, stopword support) + the conjunctive keep verdict.
  segment_dedup         — repeated-passage removal: split each doc into
      10-word segments, drop any segment whose exact text occurs in
      >= 3 distinct docs (corpus boilerplate), reassemble the rest in
      order (the CCNet/MassiveText paragraph-dedup shape).
  dedup_keep_best       — canonical-document selection: among exact
      content duplicates keep the highest-quality copy (longest, then
      lowest doc_id) rather than exact_dedup's min-id policy.

All deterministic, all certified against DuckDB.

100 TB posture:
- gopher rules are a narrow per-row projection fused into the scan —
  zero shuffles; at scale this is the cheapest filter to run FIRST.
- segment_dedup shuffles (a) sha2(segment) for the document frequency
  count (32-byte keys, map-side combined — segment TEXT never rides
  this shuffle) and (b) segments by doc_id for reassembly, so content
  moves exactly once; the drop decisions travel back as a broadcast
  (doc_id, position) set of the boilerplate hits only.
- dedup_keep_best is one shuffle on the content hash carrying
  (hash, n_chars, doc_id) triples only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# gopher_quality_filter
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and", "in")
_STOP_IN = ", ".join(f"'{w}'" for w in _STOPWORDS)

_GOPHER_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), m AS (
  SELECT doc_id,
    len(w) AS n_words,
    CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w)
      AS mean_word_len,
    CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      / len(text) AS symbol_ratio,
    len(list_filter(w, x -> x IN ({_STOP_IN}))) AS stop_hits
  FROM base
  WHERE len(w) > 0
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  mean_word_len,
  symbol_ratio,
  CAST(stop_hits AS BIGINT) AS stop_hits,
  (n_words BETWEEN 50 AND 100000) AS ok_words,
  (mean_word_len BETWEEN 3.0 AND 10.0) AS ok_word_len,
  (symbol_ratio < 0.1) AS ok_symbols,
  (stop_hits >= 2) AS ok_stopwords,
  ((n_words BETWEEN 50 AND 100000)
   AND (mean_word_len BETWEEN 3.0 AND 10.0)
   AND (symbol_ratio < 0.1)
   AND (stop_hits >= 2)) AS keep
FROM m
"""


def gopher_gate(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """The Gopher rule battery as a reusable frame -> frame transform:
    stateless narrow expressions only, so the SAME gate runs on a batch
    table and on an unbounded stream (tests/test_warc_source.py drives
    it over the WARC spool stream) — batch certification carries over
    because the logic is literally shared, not re-implemented."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.expr(f"filter(split({text_col}, ' '), x -> x != '')").alias("w"),
    ).filter(F.expr("size(w) > 0"))
    n_words = F.expr("size(w)").cast("long")
    mean_wl = (
        F.expr("aggregate(w, 0, (acc, x) -> acc + length(x))").cast("double")
        / F.expr("size(w)")
    )
    symbol_ratio = (
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).cast("double")
        / F.length("text")
    )
    stop_hits = F.expr(f"size(filter(w, x -> x IN ({_STOP_IN})))").cast("long")
    m = base.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
    )
    ok_words = F.col("n_words").between(50, 100000)
    ok_word_len = F.col("mean_word_len").between(3.0, 10.0)
    ok_symbols = F.col("symbol_ratio") < 0.1
    ok_stop = F.col("stop_hits") >= 2
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "stop_hits",
        ok_words.alias("ok_words"),
        ok_word_len.alias("ok_word_len"),
        ok_symbols.alias("ok_symbols"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_word_len & ok_symbols & ok_stop).alias("keep"),
    )


@register("gopher_quality_filter", _GOPHER_ORACLE)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule battery, one narrow zero-shuffle projection:
    every rule is an array/regex expression over the text column; the
    keep verdict is the conjunction.  Division by n_words is the same
    int/int -> double in both engines (exact for these magnitudes).
    Logic lives in gopher_gate (a frame transform) so the identical
    gate also runs on streams."""
    tune(spark)
    return gopher_gate(t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# segment_dedup
# --------------------------------------------------------------------------

_SEG_WORDS = 10
_SEG_MAX_DF = 3  # segments present in >= this many distinct docs are dropped

_SEGMENT_ORACLE = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), segs AS (
  SELECT doc_id, j,
         array_to_string(w[j*{_SEG_WORDS}+1 : j*{_SEG_WORDS}+{_SEG_WORDS}], ' ')
           AS seg
  FROM (
    SELECT doc_id, w,
           unnest(range(0, CAST(ceil(len(w)/{_SEG_WORDS}.0) AS BIGINT))) AS j
    FROM words
  )
), freq AS (
  SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg
)
SELECT s.doc_id,
  string_agg(CASE WHEN f.df < {_SEG_MAX_DF} THEN s.seg END, ' ' ORDER BY s.j)
    AS kept_text,
  CAST(COUNT(*) AS BIGINT) AS n_segments,
  CAST(SUM(CASE WHEN f.df >= {_SEG_MAX_DF} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_removed
FROM segs s JOIN freq f ON f.seg = s.seg
GROUP BY s.doc_id
"""


@register("segment_dedup", _SEGMENT_ORACLE)
def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-passage removal with in-order reassembly: 10-word
    segments, corpus document frequency per exact segment text, drop
    segments seen in >= 3 docs, stitch the survivors back with original
    ordering.  Reassembly keeps (position, segment) pairs through the
    groupBy and sorts the array per doc — never a window over the whole
    corpus."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    # token array projected ONCE: a split() reference inside the
    # transform lambda would re-split the text per segment index
    # (quadratic — the span_near_query lesson)
    segs = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(ceil(size(w)/{_SEG_WORDS}.0)) - 1),"
                f" j -> concat_ws(' ', slice(w, j*{_SEG_WORDS}+1, {_SEG_WORDS})))"
            )
        ).alias("j", "seg"),
    )
    # document frequency over sha2(segment): the frequency shuffle
    # carries 32-byte keys, never segment text; the drop decisions come
    # back as a (doc_id, j) position set (only the boilerplate hits —
    # broadcastable), so segment text moves ONLY in the per-doc
    # reassembly shuffle.  (sha2 collisions would need 2^128 segments.)
    hsegs = segs.select("doc_id", "j", F.sha2("seg", 256).alias("h"))
    freq = hsegs.groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
    dropped = (
        hsegs.join(freq.filter(F.col("df") >= _SEG_MAX_DF), "h")
        .select("doc_id", "j", F.lit(True).alias("rm"))
    )
    # No broadcast hint: `dropped` scales with total boilerplate
    # occurrences corpus-wide ((doc_id, j) per hit), which a high
    # boilerplate fraction makes arbitrarily large — AQE picks broadcast
    # when it actually fits, and a sort-merge join on (doc_id, j) stays
    # correct at any scale.
    joined = segs.join(dropped, ["doc_id", "j"], "left")
    kept_arr = F.array_sort(
        F.collect_list(
            F.when(F.col("rm").isNull(), F.struct("j", "seg"))
        )
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            kept_arr.alias("kept"),
            F.count("*").alias("n_segments"),
            F.sum(F.coalesce(F.col("rm"), F.lit(False)).cast("long")).alias("n_removed"),
        )
        .select(
            "doc_id",
            F.when(
                F.size("kept") > 0,
                F.expr("concat_ws(' ', transform(kept, x -> x.seg))"),
            ).alias("kept_text"),
            "n_segments",
            "n_removed",
        )
    )


# --------------------------------------------------------------------------
# dedup_keep_best
# --------------------------------------------------------------------------

_KEEP_BEST_ORACLE = """
SELECT content_sha, doc_id AS keep_doc_id,
       CAST(n_copies AS BIGINT) AS n_copies
FROM (
  SELECT sha256(text) AS content_sha, doc_id,
         COUNT(*) OVER (PARTITION BY sha256(text)) AS n_copies,
         row_number() OVER (PARTITION BY sha256(text)
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
WHERE rn = 1
"""


@register("dedup_keep_best", _KEEP_BEST_ORACLE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection among exact duplicates: keep the longest copy
    (ties -> lowest doc_id).  Same single content-hash shuffle as
    exact_dedup; the policy differs (argmax-by-quality, the shape used
    when duplicates differ in truncation or metadata)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    hashed = docs.select(
        F.sha2("text", 256).alias("content_sha"), "doc_id", "n_chars"
    )
    w = Window.partitionBy("content_sha")
    wo = w.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        hashed.withColumn("n_copies", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
        .select("content_sha", F.col("doc_id").alias("keep_doc_id"), "n_copies")
    )


# --------------------------------------------------------------------------
# k_anonymity_audit  (privacy QA for curated releases: a quasi-identifier
# combination shared by fewer than k documents can re-identify its
# authors — the audit every dataset release runs next to pii_scrub.
# One grouped aggregate; the flag is a pure projection of the count.)
# --------------------------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
SELECT lang,
       source,
       CAST(n_chars // 200 AS BIGINT) AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS group_n,
       COUNT(*) >= {_KANON_K} AS k_anonymous
FROM documents
GROUP BY lang, source, n_chars // 200
"""


@register("k_anonymity_audit", _KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group the corpus by its quasi-identifier tuple (lang, source,
    coarse length bucket) and flag every group smaller than k=5.  At
    100 TB this is one hash aggregate with map-side partials — the
    quasi-identifier cardinality, not the corpus, bounds the result;
    releases act on the flagged rows (suppress or generalize)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            "source",
            # floor, not truncate-toward-zero: matches the oracle's
            # integer // even if lengths ever admit negatives/nulls
            F.floor(F.col("n_chars") / 200).cast("bigint").alias("len_bucket"),
        )
        .agg(F.count("*").alias("group_n"))
        .select(
            "lang", "source", "len_bucket", "group_n",
            (F.col("group_n") >= _KANON_K).alias("k_anonymous"),
        )
    )


# --------------------------------------------------------------------------
# embedding_psi_drift  (population stability index between a reference
# and a current embedding population — the standard "did my feature
# distribution move" monitor, run per histogram bucket so the output
# is bucket-sized and the math stays engine-portable)
# --------------------------------------------------------------------------

_PSI_BINS_LO, _PSI_BINS_HI = -20, 19  # floor(x*10) clamped
_PSI_EPS = 1e-6  # probability floor: one-sided buckets must CONTRIBUTE

_PSI_ORACLE = f"""
WITH pop AS (
  SELECT vec_id % 2 AS side,
         greatest({_PSI_BINS_LO},
                  least({_PSI_BINS_HI},
                        CAST(floor(CAST(embedding[1] AS DOUBLE) * 10)
                             AS BIGINT))) AS bucket
  FROM embeddings
), counts AS (
  SELECT bucket,
         COUNT(*) FILTER (WHERE side = 0) AS n_ref,
         COUNT(*) FILTER (WHERE side = 1) AS n_cur
  FROM pop GROUP BY bucket
), tot AS (
  SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
)
SELECT c.bucket,
       CAST(c.n_ref AS BIGINT) AS n_ref,
       CAST(c.n_cur AS BIGINT) AS n_cur,
       round((CAST(c.n_cur AS DOUBLE) / t.t_cur
              - CAST(c.n_ref AS DOUBLE) / t.t_ref)
             * round(ln(greatest(CAST(c.n_cur AS DOUBLE) / t.t_cur, {_PSI_EPS})
                        / greatest(CAST(c.n_ref AS DOUBLE) / t.t_ref, {_PSI_EPS})),
                     6),
             6) AS psi_term
FROM counts c CROSS JOIN tot t
"""


@register("embedding_psi_drift", _PSI_ORACLE)
def embedding_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI terms per dim-0 histogram bucket between the even-id
    (reference) and odd-id (current) embedding populations; the
    monitor's score is the sum of psi_term, kept per-bucket here so
    the certified output also localizes WHERE the distribution moved.
    One-sided buckets (mass present on only one side — the STRONGEST
    drift signal) are floored at eps=1e-6 probability rather than
    dropped, the standard PSI guard; a total distribution shift now
    produces large terms instead of an empty frame (round-5 review).

    Engine portability: float32 -> double is exact, bucket floors are
    integer, each probability is one IEEE division of exact int64s
    (greatest() against the eps literal is deterministic), and ln
    rounds to 6 places immediately (house hash rule).
    At 100 TB: one scan, one bucket-sized aggregate, a 1-row totals
    broadcast — nothing scales with corpus size after the scan."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    bucket = F.greatest(
        F.lit(_PSI_BINS_LO),
        F.least(
            F.lit(_PSI_BINS_HI),
            F.floor(
                F.element_at("embedding", 1).cast("double") * 10
            ).cast("bigint"),
        ),
    )
    side = (F.col("vec_id") % 2).alias("side")
    counts = (
        emb.select(side, bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("side") == 0, 1)).alias("n_ref"),
            F.count(F.when(F.col("side") == 1, 1)).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = counts.crossJoin(F.broadcast(tot))
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur")
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref")
    ln_ratio = F.round(
        F.log(
            F.greatest(p_cur, F.lit(_PSI_EPS))
            / F.greatest(p_ref, F.lit(_PSI_EPS))
        ),
        6,
    )
    psi = F.round(
        (
            F.col("n_cur").cast("double") / F.col("t_cur")
            - F.col("n_ref").cast("double") / F.col("t_ref")
        )
        * ln_ratio,
        6,
    )
    return j.select("bucket", "n_ref", "n_cur", psi.alias("psi_term"))
