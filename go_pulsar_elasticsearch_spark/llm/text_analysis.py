"""Text-analysis operators for LLM training-data pipelines.

Language ID (stopword-marker heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting
(k-gram min-hash, winnowing style).  Every operator is a pure
JVM-side expression pipeline (regex/string built-ins, no Python),
deterministic, and DuckDB-certified.

At 100 TB these are all narrow per-row transforms — zero shuffle; they
pipeline inside one WholeStageCodegen span right after the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# text_stats
# --------------------------------------------------------------------------

_STOPWORDS_RE = r"\b(the|a|of|and|to|in|is|it|for|on)\b"

_STATS_ORACLE = rf"""
SELECT
  doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_obs,
  CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT) AS n_words,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_words,
  CAST(length(replace(text, ' ', '')) AS DOUBLE)
    / len(regexp_split_to_array(text, ' +')) AS avg_word_len,
  CAST(len(regexp_extract_all(text, '{_STOPWORDS_RE}')) AS DOUBLE)
    / len(regexp_split_to_array(text, ' +')) AS stopword_ratio
FROM documents
"""


@register("text_stats", _STATS_ORACLE)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics (length, word counts, stopword
    density) — the features quality filters cut on."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " +")).cast("bigint")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_obs"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint").alias(
            "n_uniq_words"
        ),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_words
        ).alias("avg_word_len"),
        (
            F.size(F.regexp_extract_all("text", F.lit(_STOPWORDS_RE), 0)).cast("double")
            / n_words
        ).alias("stopword_ratio"),
    )


# --------------------------------------------------------------------------
# lang_id_ngram
# --------------------------------------------------------------------------

_MARKERS = {
    "en": r"\b(the|and|of|is|was|with)\b",
    "de": r"\b(der|die|das|und|ist|mit)\b",
    "fr": r"\b(le|la|les|et|est|avec)\b",
    "es": r"\b(el|los|las|es|con|una)\b",
}

_LANG_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_true,
    len(regexp_extract_all(text, '{_MARKERS["en"]}')) AS s_en,
    len(regexp_extract_all(text, '{_MARKERS["de"]}')) AS s_de,
    len(regexp_extract_all(text, '{_MARKERS["fr"]}')) AS s_fr,
    len(regexp_extract_all(text, '{_MARKERS["es"]}')) AS s_es
  FROM documents
)
SELECT doc_id, lang_true,
  CASE
    WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
    WHEN s_fr >= s_es THEN 'fr'
    ELSE 'es'
  END AS lang_pred,
  CAST(s_en AS BIGINT) AS s_en
FROM scored
"""


@register("lang_id_ngram", _LANG_ORACLE)
def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (argmax over per-language stopword hit
    counts, deterministic tie-break en>de>fr>es)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    s = {
        k: F.size(F.regexp_extract_all("text", F.lit(pat), 0))
        for k, pat in _MARKERS.items()
    }
    no_hits = (s["en"] == 0) & (s["de"] == 0) & (s["fr"] == 0) & (s["es"] == 0)
    pred = (
        F.when(no_hits, "unknown")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        pred.alias("lang_pred"),
        s["en"].cast("bigint").alias("s_en"),
    )


# --------------------------------------------------------------------------
# quality_score
# --------------------------------------------------------------------------

_QUALITY_ORACLE = rf"""
WITH feat AS (
  SELECT doc_id,
    len(regexp_split_to_array(text, ' +')) AS n_words,
    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      / length(text) AS punct_ratio,
    CAST(len(regexp_extract_all(text, '{_STOPWORDS_RE}')) AS DOUBLE)
      / len(regexp_split_to_array(text, ' +')) AS stop_ratio
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, punct_ratio, stop_ratio,
  least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5
    + (1.0 - punct_ratio) * 0.3 + least(stop_ratio * 4.0, 1.0) * 0.2
    AS quality,
  least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5
    + (1.0 - punct_ratio) * 0.3 + least(stop_ratio * 4.0, 1.0) * 0.2 >= 0.5
    AS keep
FROM feat
"""


@register("quality_score", _QUALITY_ORACLE)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score in [0,1]: length term + cleanliness term +
    stopword-density term; keep-flag at 0.5 (the C4-style filter shape)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_words = F.size(F.split("text", " +"))
    punct_ratio = (
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).cast("double")
        / F.length("text")
    )
    stop_ratio = (
        F.size(F.regexp_extract_all("text", F.lit(_STOPWORDS_RE), 0)).cast("double")
        / n_words
    )
    quality = (
        F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - punct_ratio) * 0.3
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
        (quality >= 0.5).alias("keep"),
    )


# --------------------------------------------------------------------------
# token_count  (whitespace + BPE-ish regex pre-tokenizer)
# --------------------------------------------------------------------------

_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

_TOKEN_ORACLE = f"""
SELECT
  doc_id,
  CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS bpe_tokens,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_est_tokens
FROM documents
"""


@register("token_count", _TOKEN_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish pre-tokenizer
    regex (letter runs / digit runs / punctuation), and the chars/4
    estimate — the budget arithmetic of corpus curation."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " +")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0))
        .cast("bigint")
        .alias("bpe_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_est_tokens"),
    )


# --------------------------------------------------------------------------
# doc_fingerprint  (k-gram min-hash, winnowing style)
# --------------------------------------------------------------------------

_FP_ORACLE = """
SELECT doc_id,
       MIN(md5(g)) AS fingerprint,
       MIN(md5('salt:' || g)) AS fingerprint_alt
FROM (
  SELECT doc_id, substr(text, i, 8) AS g
  FROM (
    SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS i
    FROM documents WHERE length(text) >= 8
  )
)
GROUP BY doc_id
"""


@register("doc_fingerprint", _FP_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling char-8-gram fingerprint: min hash over all 8-gram windows
    (plus a salted second hash) — winnowing's selection step with a
    global window.  Content-defined, robust to small edits at either
    end of the document."""
    tune(spark)
    docs = t(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 7), i -> substring(text, i, 8))")
        ).alias("g"),
    )
    return grams.groupBy("doc_id").agg(
        F.min(F.md5(F.col("g"))).alias("fingerprint"),
        F.min(F.md5(F.concat(F.lit("salt:"), F.col("g")))).alias("fingerprint_alt"),
    )


# --------------------------------------------------------------------------
# vocab_topk
# --------------------------------------------------------------------------

_VOCAB_K = 25

_VOCAB_ORACLE = f"""
SELECT word, cnt, df_docs, rk FROM (
  SELECT word,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_docs,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS BIGINT) AS rk
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
  GROUP BY word
) WHERE rk <= {_VOCAB_K}
"""


@register("vocab_topk", _VOCAB_ORACLE)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy-hitters: top-25 terms by total frequency
    with document frequency alongside (the "what dominates my corpus"
    sanity pass before tokenizer training).

    Scale shape: explode is narrow; the grouped count + distinct-count
    collapse the corpus to vocabulary size with map-side partial aggs
    doing the heavy lifting.  Only the already-tiny vocabulary table
    crosses the single-partition ranking window — never the corpus.
    Ties broken by the word itself so the top-k is deterministic."""
    from pyspark.sql import Window

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    counts = tok.groupBy("word").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("doc_id").alias("df_docs"),
    )
    rk = F.row_number().over(
        Window.partitionBy().orderBy(F.col("cnt").desc(), "word")
    )
    return (
        counts.select("word", "cnt", "df_docs", rk.cast("bigint").alias("rk"))
        .filter(F.col("rk") <= _VOCAB_K)
    )


# --------------------------------------------------------------------------
# boilerplate_ngrams
# --------------------------------------------------------------------------

_BOILER_MIN_DF = 5

_BOILER_ORACLE = f"""
WITH grams AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 3
  )
), df AS (
  SELECT g, COUNT(*) AS df FROM grams GROUP BY g
)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN df.df >= {_BOILER_MIN_DF} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(SUM(CASE WHEN df.df >= {_BOILER_MIN_DF} THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS boiler_frac
FROM grams JOIN df ON df.g = grams.g
GROUP BY grams.doc_id
"""


@register("boilerplate_ngrams", _BOILER_ORACLE)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: word-3-grams shared by >= 5 documents are
    "boilerplate" (headers, footers, templates at web scale); each doc
    reports its distinct-gram count and the fraction that is boilerplate
    — the pre-filter signal for template-heavy page removal.

    Scale shape: doc frequency is an unordered count-over-window
    partitioned on the gram (no join back, no second materialization of
    the gram set) — 3 shuffles total: the per-doc distinct, the window
    on `g` (high-cardinality, well spread), and the final per-doc
    rollup.  The equivalent df-table + self-join formulation costs 4."""
    from pyspark.sql import Window

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    grams = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(1, size(w) - 2),"
                    " i -> concat_ws(' ', element_at(w, i),"
                    " element_at(w, i + 1), element_at(w, i + 2))))"
                )
            ).alias("g"),
        )
    )
    df = F.count("*").over(Window.partitionBy("g"))
    boiler = F.when(df >= _BOILER_MIN_DF, 1).otherwise(0)
    return (
        grams.select("doc_id", boiler.alias("is_boiler"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("is_boiler").alias("n_boiler"),
            (F.sum("is_boiler").cast("double") / F.count("*")).alias("boiler_frac"),
        )
    )


# --------------------------------------------------------------------------
# cooccurrence_pmi  (corpus term-association mining)
# --------------------------------------------------------------------------

_PMI_MIN_AB = 20
_PMI_TOPN = 20

_PMI_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
), df AS (
  SELECT term, COUNT(*) AS df FROM toks GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
pairs AS (
  SELECT t1.term AS term_a, t2.term AS term_b, COUNT(*) AS n_ab
  FROM toks t1 JOIN toks t2
    ON t1.doc_id = t2.doc_id AND t1.term < t2.term
  GROUP BY t1.term, t2.term
), scored AS (
  SELECT term_a, term_b, n_ab, da.df AS n_a, db.df AS n_b,
         round(ln((CAST(n_ab AS DOUBLE) * n_docs)
                  / (CAST(da.df AS DOUBLE) * CAST(db.df AS DOUBLE))), 6) AS pmi
  FROM pairs
  JOIN df da ON da.term = term_a
  JOIN df db ON db.term = term_b
  CROSS JOIN n
  WHERE n_ab >= {_PMI_MIN_AB}
)
SELECT term_a, term_b, n_ab, n_a, n_b, pmi, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY pmi DESC, term_a, term_b) AS rk
      FROM scored)
WHERE rk <= {_PMI_TOPN}
"""


@register("cooccurrence_pmi", _PMI_ORACLE)
def cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over term pairs co-occurring in a
    document — the classic collocation / term-association miner
    (phrase detection, taxonomy seeds): pmi = ln(P(a,b)/(P(a)P(b))) at
    doc granularity, min 20 co-occurrences, top-20 pairs.

    Deterministic: counts are exact integers; the single ln is rounded
    to 6 decimals before ranking, ties break lexicographically.

    100 TB posture: the (doc, term) posting pass feeds BOTH the df agg
    and the pair build; the pair self-join shuffles on doc_id once and
    its output collapses to |vocab|^2 at most (vocabulary-sized, small)
    via a map-side-combined count.  The df table broadcasts back.  For
    web-scale vocabularies the standard mitigation applies: drop
    ultra-high-df stopwords BEFORE pairing (they dominate pair volume
    and carry no PMI signal)."""
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
    t1 = toks.select("doc_id", F.col("term").alias("term_a"))
    t2 = toks.select("doc_id", F.col("term").alias("term_b"))
    pairs = (
        t1.join(t2, ["doc_id"])
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_AB)
    )
    pmi = F.round(
        F.log(
            (F.col("n_ab").cast("double") * F.col("n_docs"))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ),
        6,
    )
    scored = (
        pairs.join(
            F.broadcast(df_tbl.select(F.col("term").alias("term_a"), F.col("df").alias("n_a"))),
            "term_a",
        )
        .join(
            F.broadcast(df_tbl.select(F.col("term").alias("term_b"), F.col("df").alias("n_b"))),
            "term_b",
        )
        .crossJoin(F.broadcast(n))
        .select("term_a", "term_b", "n_ab", "n_a", "n_b", pmi.alias("pmi"))
    )
    top = scored.orderBy(F.desc("pmi"), "term_a", "term_b").limit(_PMI_TOPN)
    rk = F.row_number().over(Window.orderBy(F.desc("pmi"), "term_a", "term_b"))
    return top.select("term_a", "term_b", "n_ab", "n_a", "n_b", "pmi", rk.alias("rk"))


# --------------------------------------------------------------------------
# langid_confusion  (classifier evaluation: truth x prediction matrix)
# --------------------------------------------------------------------------

_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANG_ORACLE})
SELECT lang_true, lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN lang_true = lang_pred THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct
FROM pred
GROUP BY lang_true, lang_pred
"""


@register("langid_confusion", _CONFUSION_ORACLE)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness shape: the language-ID classifier's confusion
    matrix (truth x prediction counts) — the quality report any corpus
    labeler ships alongside its labels.  Composes the certified
    lang_id_ngram output with one (truth, pred) groupBy — the same
    single shuffle an accuracy/precision/recall report costs at any
    scale."""
    tune(spark)
    pred = lang_id_ngram(spark, sf_dir)
    return pred.groupBy("lang_true", "lang_pred").agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("lang_true") == F.col("lang_pred")).cast("long")
        ).alias("n_correct"),
    )


# --------------------------------------------------------------------------
# text_entropy  (character/word Shannon entropy: the gibberish signal)
# --------------------------------------------------------------------------

# Quality batteries (Dolma, RedPajama-v2) cut on Shannon entropy at both
# granularities: near-zero char entropy = repeated-character junk,
# near-zero word entropy = boilerplate loops, abnormally HIGH char
# entropy = binary/base64 spillage.  Both are exact-int frequency
# ratios + the round-6 ln + exact-decimal sum recipe, so the whole op
# is hash-certified.

_ENTROPY_ORACLE = """
WITH chars AS (
  SELECT doc_id, substr(text, i, 1) AS ch
  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        FROM documents WHERE length(text) > 0)
), cc AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c FROM chars
  GROUP BY doc_id, ch
), cn AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cc GROUP BY doc_id
), ce AS (
  SELECT cc.doc_id,
         -CAST(SUM(CAST(cc.c * round(ln(CAST(cc.c AS DOUBLE) / cn.n), 6)
                        AS DECIMAL(18,6))) AS DOUBLE) / cn.n AS h_char
  FROM cc JOIN cn ON cn.doc_id = cc.doc_id
  GROUP BY cc.doc_id, cn.n
), words AS (
  SELECT doc_id, word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  WHERE word <> ''
), wc AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c FROM words
  GROUP BY doc_id, word
), wn AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM wc GROUP BY doc_id
), we AS (
  SELECT wc.doc_id,
         -CAST(SUM(CAST(wc.c * round(ln(CAST(wc.c AS DOUBLE) / wn.n), 6)
                        AS DECIMAL(18,6))) AS DOUBLE) / wn.n AS h_word
  FROM wc JOIN wn ON wn.doc_id = wc.doc_id
  GROUP BY wc.doc_id, wn.n
)
SELECT ce.doc_id, ce.h_char, we.h_word
FROM ce JOIN we ON we.doc_id = ce.doc_id
"""


@register("text_entropy", _ENTROPY_ORACLE)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy at character and word granularity
    (nats) — low char entropy flags repeated-character junk, low word
    entropy flags boilerplate loops, high char entropy flags binary
    spillage.

    Scale shape: both explodes are narrow; the (doc_id, symbol) counts
    partial-aggregate map-side, so the shuffle carries at most
    |alphabet| (resp. |doc vocabulary|) rows per document — bounded,
    nothing corpus-proportional beyond the scan.  The entropy sums ride
    the exact-decimal recipe (c * round(ln(c/n), 6) summed as
    DECIMAL(18,6)) for bit-identical certification."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")

    def _entropy(sym_frame: DataFrame, out: str) -> DataFrame:
        cc = sym_frame.groupBy("doc_id", "sym").agg(F.count("*").alias("c"))
        cn = cc.groupBy("doc_id").agg(F.sum("c").alias("n"))
        term = F.col("c") * F.round(
            F.log(F.col("c").cast("double") / F.col("n")), 6
        )
        return (
            cc.join(cn, "doc_id")
            .groupBy("doc_id", "n")
            .agg(
                F.sum(term.cast("decimal(18,6)")).cast("double").alias("_s")
            )
            .select(
                "doc_id", (-F.col("_s") / F.col("n")).alias(out)
            )
        )

    chars = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text)),"
                    " i -> substring(text, i, 1))"
                )
            ).alias("sym"),
        )
    )
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("sym")
    ).filter(F.col("sym") != "")
    return _entropy(chars, "h_char").join(
        _entropy(words, "h_word"), "doc_id"
    )


# --------------------------------------------------------------------------
# tokenizer_fertility  (bytes/chars per token, by language)
# --------------------------------------------------------------------------

_FERTILITY_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(strlen(text)) AS DOUBLE)
         / SUM(len(string_split(text, ' '))) AS bytes_per_token,
       CAST(SUM(length(text)) AS DOUBLE)
         / SUM(len(string_split(text, ' '))) AS chars_per_token
FROM documents
GROUP BY lang
"""


@register("tokenizer_fertility", _FERTILITY_ORACLE)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: bytes-per-token and
    chars-per-token over the whitespace tokenization — the standard
    signal for how efficiently a tokenizer (or a candidate vocab size)
    spends its budget per language, and the per-language multiplier
    that converts corpus bytes to training tokens when sizing a data
    mixture.  Integer sums stay exact (< 2^53) so the final double
    divisions are bit-identical across engines.

    Scale: pure scan + one map-side-combined groupBy on the bounded
    lang key — zero data-sized state."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    tokens = F.size(F.split("text", " ", -1))
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("text")).alias("total_bytes"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(tokens.cast("long")).alias("total_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_bytes",
        "total_chars",
        "total_tokens",
        (F.col("total_bytes").cast("double") / F.col("total_tokens")).alias(
            "bytes_per_token"
        ),
        (F.col("total_chars").cast("double") / F.col("total_tokens")).alias(
            "chars_per_token"
        ),
    )


# --------------------------------------------------------------------------
# readability_score  (Flesch-style reading ease: curation pipelines gate
# on it to separate prose from tables/boilerplate/code — one more
# deterministic text-quality signal next to quality_score/gopher)
# --------------------------------------------------------------------------

_READABILITY_ORACLE = """
WITH c AS (
  SELECT doc_id,
         len(regexp_split_to_array(text, ' +')) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS n_sentences,
         greatest(len(regexp_extract_all(text, '[aeiou]+')), 1) AS n_syllables
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
             6) AS flesch,
       CASE WHEN 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) >= 60
            THEN 'easy'
            WHEN 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) >= 30
            THEN 'moderate'
            ELSE 'hard' END AS band
FROM c
"""


@register("readability_score", _READABILITY_ORACLE)
def readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style reading ease from three deterministic counts
    (whitespace words, sentence punctuation, vowel-group syllable
    proxy).  All three counts are exact ints, the two ratios are
    IEEE-exact divisions, and the score rounds to 6 places on both
    engines (house hash rule), so the float formula hash-certifies.
    One scan, zero shuffles — the gate composes into curation filters
    for free."""
    tune(spark)
    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_words = F.size(F.split("text", " +"))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]"), 0)), F.lit(1)
    )
    n_syll = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]+"), 0)), F.lit(1)
    )
    raw = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent)
        - F.lit(84.6) * (n_syll.cast("double") / n_words)
    )
    band = (
        F.when(raw >= 60, F.lit("easy"))
        .when(raw >= 30, F.lit("moderate"))
        .otherwise(F.lit("hard"))
    )
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syll.cast("bigint").alias("n_syllables"),
        F.round(raw, 6).alias("flesch"),
        band.alias("band"),
    )
