"""Statistical LM scoring + weighted selection for corpus curation.

  lm_perplexity_bucket — CCNet-style quality bucketing (Wenzek et al.
                         2020, "CCNet: Extracting High Quality
                         Monolingual Datasets from Web Crawl Data"):
                         fit an add-one-smoothed unigram LM on the
                         corpus, score every document by per-token
                         cross-entropy, and assign head/middle/tail
                         buckets at fixed thresholds (CCNet's
                         production form uses precomputed per-language
                         cutoffs exactly like this — no global sort).
  kl_domain_divergence — per-source distribution drift: KL(P_source ||
                         Q_corpus) over unigrams, the "which slice
                         stopped looking like the corpus" monitor that
                         pairs with mixture_weights_temperature
                         (llm/sampling.py) and quality_drift_monitor.
  weighted_sample_wor  — Efraimidis–Spirakis (2006) weighted sampling
                         WITHOUT replacement: every row gets the key
                         ln(u)/w for a deterministic md5-derived
                         uniform u, and the global top-K by key is
                         exactly a w-weighted sample.  Zero RNG state:
                         re-running, adding executors, or sampling a
                         late shard reproduces the identical pick.

All three are fully hash-certified vs DuckDB.  Cross-engine numeric
rules (functions/exact.py): ln() is rounded to 6 decimals the moment it
is computed (the 1-ulp transcendental divergence rule); every sum of
doubles goes through the exact-decimal dsum/SUMD pair; everything else
is integer arithmetic or single IEEE ops on identical inputs.

100 TB posture:
- lm_perplexity_bucket: two corpus-sized shuffles (token count, per-doc
  regroup) plus a vocabulary-sized model frame that joins back onto the
  token stream — vocab is sublinear in corpus size (Heaps' law), so the
  model side stays broadcastable far past the fixture; AQE falls back
  to sort-merge if a tokenizer explosion ever makes it wide.  The
  bucket step is a stateless per-row CASE — the reason CCNet ships
  fixed thresholds instead of corpus quantiles at scale.
- kl_domain_divergence: collapses to |vocab| then |sources| rows; the
  only data-sized work is the one (source, word) count.
- weighted_sample_wor: no window, no global sort — the top-K is
  TakeOrderedAndProject (per-partition heap + driver merge of K rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# lm_perplexity_bucket
# --------------------------------------------------------------------------

# Fixed cross-entropy cutoffs (nats/token).  Chosen once from the
# fixture's CE distribution the way CCNet chooses per-language cutoffs
# from a held-out Wikipedia LM: head < T1 <= middle < T2 <= tail.
# Data-independent constants keep the operator a pure scan + join —
# corpus-quantile cutoffs would force a global sort.
_CE_HEAD_LT = 3.400
_CE_MID_LT = 3.404

def tokenize(docs: DataFrame) -> DataFrame:
    """(doc_id, word) stream — THE tokenization every LM-scoring
    consumer shares (the streaming monitor imports these helpers, so
    batch and incremental scoring cannot drift)."""
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")


def score_docs(docs: DataFrame, counts: DataFrame) -> DataFrame:
    """Score documents against an explicit unigram count table
    (word, c): add-one smoothing, round-6 ln, exact-decimal CE sum,
    fixed bucket thresholds.  lm_perplexity_bucket is exactly this over
    the corpus's own counts; streaming/lm_monitor.py scores each
    micro-batch against the accumulated store with the same function."""
    tok = tokenize(docs)
    tot = counts.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    lm = counts.crossJoin(F.broadcast(tot)).select(
        "word",
        F.round(
            F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("n") + F.col("v")).cast("double")
            ),
            6,
        ).alias("logp"),
    )
    doc = tok.join(lm, "word").groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        dsum("logp", 6, 18, out_scale=6).alias("_slp"),
    )
    ce = -F.col("_slp") / F.col("n_tok")
    return doc.select(
        "doc_id",
        "n_tok",
        ce.alias("ce"),
        F.when(ce < _CE_HEAD_LT, "head")
        .when(ce < _CE_MID_LT, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


_PPL_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  WHERE word <> ''
), cnt AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY word
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
  FROM cnt
), lm AS (
  -- add-one-smoothed unigram log-prob; the (c+1)/(n+v) division is
  -- exact-int IEEE and ln() is rounded to 6 immediately
  SELECT word,
         round(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)), 6)
           AS logp
  FROM cnt, tot
), doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         -{SUMD('lm.logp', 6, 18, 6)} / COUNT(*) AS ce
  FROM tok t JOIN lm ON lm.word = t.word
  GROUP BY t.doc_id
)
SELECT doc_id, n_tok, ce,
       CASE WHEN ce < {_CE_HEAD_LT} THEN 'head'
            WHEN ce < {_CE_MID_LT} THEN 'middle'
            ELSE 'tail' END AS bucket
FROM doc
"""


@register("lm_perplexity_bucket", _PPL_ORACLE)
def lm_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: per-doc cross-entropy under an
    add-one-smoothed corpus unigram LM, bucketed head/middle/tail at
    fixed thresholds.

    Plan shape: token explode (narrow) -> vocab count (one shuffle,
    map-side combined) -> 1-row totals broadcast onto the vocab frame
    -> LM joins back onto the token stream -> per-doc regroup.  The LM
    frame is vocabulary-sized (Heaps-sublinear), the totals frame is a
    single row; only the two token-keyed shuffles scale with data.  The
    per-doc log-prob sum rides the exact-decimal dsum so the CE is
    bit-identical regardless of summation order."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    cnt = tokenize(docs).groupBy("word").agg(F.count("*").alias("c"))
    return score_docs(docs, cnt)


# --------------------------------------------------------------------------
# lm_bigram_perplexity
# --------------------------------------------------------------------------

_BIGRAM_ORACLE = f"""
WITH arr AS (
  -- empty tokens (consecutive/leading/trailing spaces) are dropped
  -- BEFORE pairing, so bigrams are over the same symbol set as the
  -- unigram op's tokenization and the smoothing vocabulary V
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), big AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        FROM arr WHERE len(w) >= 2)
), cb AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM big GROUP BY w1, w2
), cf AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM cb GROUP BY w1
), voc AS (
  SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
), lp AS (
  SELECT cb.w1, cb.w2,
         round(ln(CAST(cb.c2 + 1 AS DOUBLE) / CAST(cf.c1 + voc.v AS DOUBLE)), 6)
           AS logp
  FROM cb JOIN cf ON cf.w1 = cb.w1 CROSS JOIN voc
)
SELECT big.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       -{SUMD('lp.logp', 6, 18, 6)} / COUNT(*) AS ce2
FROM big JOIN lp ON lp.w1 = big.w1 AND lp.w2 = big.w2
GROUP BY big.doc_id
"""


@register("lm_bigram_perplexity", _BIGRAM_ORACLE)
def lm_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy under an add-one-smoothed corpus BIGRAM LM
    — p(w2|w1) = (c(w1,w2)+1)/(c(w1,·)+V) — the context-sensitive
    upgrade of lm_perplexity_bucket (a doc of common words in weird
    order scores badly here but fine there; fluency filters want this
    one).

    Plan shape: bigrams are built in-row (one transform over token
    offsets, same trick as boilerplate_ngrams), so the only data-sized
    shuffles are the (w1, w2) count and the per-doc regroup; the
    conditional-count table cf is first-word-vocab-sized, the vocab
    total is one broadcast row, and the exact-decimal dsum makes the
    CE order-independent."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    arr = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("w"),
    )
    from go_pulsar_elasticsearch_spark.functions.caching import (
        checkpoint_slot,
    )

    # `cb` feeds the conditional-count aggregate AND the logp join —
    # checkpoint it so the (w1,w2) corpus count runs once (r8 opt;
    # guide §3.3).  `big` itself stays lazy: with only two consumers,
    # materializing every bigram row measured slower than re-running
    # the in-row explode (1.78 vs 1.62 s at sf0.1)
    big = (
        arr.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> struct(w[i] AS w1, w[i + 1] AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    cb = checkpoint_slot(
        "lm2_cb", big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    )
    cf = cb.groupBy("w1").agg(F.sum("c2").alias("c1"))
    voc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .agg(F.countDistinct("word").alias("v"))
    )
    lp = (
        cb.join(cf, "w1")
        .crossJoin(F.broadcast(voc))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                ),
                6,
            ).alias("logp"),
        )
    )
    return (
        big.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            dsum("logp", 6, 18, out_scale=6).alias("_slp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (-F.col("_slp") / F.col("n_bigrams")).alias("ce2"),
        )
    )


# --------------------------------------------------------------------------
# kl_domain_divergence
# --------------------------------------------------------------------------

_KL_ORACLE = f"""
WITH tok AS (
  SELECT source, word
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents)
  WHERE word <> ''
), cnt AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY word
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
  FROM cnt
), sc AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cs
  FROM tok GROUP BY source, word
), ns AS (
  SELECT source, CAST(SUM(cs) AS BIGINT) AS n_tok FROM sc GROUP BY source
), term AS (
  -- p_s(w) ln(p_s(w)/q(w)) with p_s unsmoothed (absent words
  -- contribute 0) and q add-one-smoothed so it covers every word.
  -- Spelled as double products/divisions of exact ints in a fixed
  -- order, then ln rounded to 6; the cs weight multiplies AFTER the
  -- rounding so both engines weight identical values.
  SELECT sc.source,
         CAST(sc.cs AS DOUBLE)
           * round(ln((CAST(sc.cs AS DOUBLE) * CAST(tot.n + tot.v AS DOUBLE))
                      / (CAST(ns.n_tok AS DOUBLE) * CAST(cnt.c + 1 AS DOUBLE))), 6)
           AS w_lr
  FROM sc
  JOIN cnt ON cnt.word = sc.word
  JOIN ns  ON ns.source = sc.source
  CROSS JOIN tot
)
SELECT term.source,
       ns.n_tok,
       {SUMD('term.w_lr', 6, 18, 6)} / ns.n_tok AS kl
FROM term JOIN ns ON ns.source = term.source
GROUP BY term.source, ns.n_tok
"""


@register("kl_domain_divergence", _KL_ORACLE)
def kl_domain_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence vs the whole corpus —
    KL(P_source || Q_corpus) with unsmoothed P (absent words contribute
    zero) and add-one-smoothed Q (so the log ratio is always finite).
    The slice-drift diagnostic a mixture pipeline runs before trusting
    per-domain sampling weights.

    Plan shape: ONE corpus-sized shuffle — the (source, word) count —
    which is slot-cached and rolled up three ways (corpus word counts,
    per-source totals, grand totals) without touching the corpus again;
    the vocab-sized corpus-count join and the |sources|-row totals ride
    broadcasts, and the exact-decimal weighted-log-ratio sum collapses
    straight to |sources| rows."""
    from go_pulsar_elasticsearch_spark.functions.caching import (
        cache_slot,
        checkpoint_slot,
    )

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    sc = checkpoint_slot(
        "kl_source_word",
        tok.groupBy("source", "word").agg(F.count("*").alias("cs")),
    )
    cnt = sc.groupBy("word").agg(F.sum("cs").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    ns = sc.groupBy("source").agg(F.sum("cs").alias("n_tok"))
    ratio = (
        F.col("cs").cast("double")
        * (F.col("n") + F.col("v")).cast("double")
    ) / (
        F.col("n_tok").cast("double")
        * (F.col("c") + 1).cast("double")
    )
    term = (
        sc.join(cnt, "word")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tok",
            (F.col("cs").cast("double") * F.round(F.log(ratio), 6)).alias("w_lr"),
        )
    )
    return term.groupBy("source", "n_tok").agg(
        (dsum("w_lr", 6, 18, out_scale=6) / F.col("n_tok")).alias("kl")
    )


# --------------------------------------------------------------------------
# weighted_sample_wor
# --------------------------------------------------------------------------

_WSAMPLE_K = 50
_HEX = "0123456789abcdef"


def _md5_u32_sql(col: str) -> str:
    """Big-endian fold of the first 8 hex digits of md5(col) into a
    32-bit integer — the DuckDB twin of Spark's conv(substring(md5,1,8),
    16, 10).  Spelled digit-by-digit (strpos is 1-based in both
    engines, mirroring llm/corpus.py's 2-digit bucket)."""
    h = f"md5(CAST({col} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"CAST({terms} AS BIGINT)"


_WSAMPLE_ORACLE = f"""
SELECT doc_id, source, n_chars,
       round(ln((CAST({_md5_u32_sql('doc_id')} + 1 AS DOUBLE)) / 4294967296.0)
             / n_chars, 9) AS es_key
FROM documents
WHERE n_chars > 0
ORDER BY es_key DESC, doc_id
LIMIT {_WSAMPLE_K}
"""


@register("weighted_sample_wor", _WSAMPLE_ORACLE)
def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis
    2006): each row draws u ~ U(0,1] deterministically from md5(doc_id)
    and gets the key ln(u)/w (order-equivalent to the paper's u^(1/w));
    the global top-K by key is an exact w-weighted WOR sample, here
    weighted by document length (n_chars).

    Distributed shape: the keying is a stateless per-row expression and
    the top-K compiles to TakeOrderedAndProject — per-partition K-row
    heaps merged on the driver, never a global sort.  Deterministic by
    construction: no RNG state, so replays and late shards agree."""
    tune(spark)
    docs = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u32 = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
        " as bigint)"
    )
    key = F.round(
        F.log((u32 + 1).cast("double") / F.lit(4294967296.0))
        / F.col("n_chars"),
        9,
    )
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(_WSAMPLE_K)
    )


# --------------------------------------------------------------------------
# lm_kn_perplexity  (interpolated Kneser-Ney bigram LM — the KenLM family)
# --------------------------------------------------------------------------

# Interpolated Kneser-Ney with the standard fixed discount d=0.75:
#
#   p(w2|w1) = (max(c(w1,w2) - d, 0) + d * T(w1) * Pc(w2)) / c(w1,.)
#   Pc(w2)   = N1+(., w2) / N1+(., .)       (continuation probability)
#   T(w1)    = |{w2 : c(w1,w2) > 0}|        (distinct continuations)
#
# Over the full vocabulary the distribution sums to EXACTLY 1 (the
# discounted mass d*T(w1) is exactly what the continuation term
# redistributes) — pytest-pinned per context.  Every ingredient is an
# integer count; the probability is one fixed-shape IEEE double chain
# shared textually with the oracle, and the per-doc sum rides the
# round-6 ln + exact-decimal recipe, so the whole op is hash-certified.
_KN_D = 0.75

_KN_ORACLE = f"""
WITH arr AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), big AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        FROM arr WHERE len(w) >= 2)
), cb AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM big GROUP BY w1, w2
), cf AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS t1
  FROM cb GROUP BY w1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_end FROM cb GROUP BY w2
), bt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM cb
), lp AS (
  SELECT cb.w1, cb.w2,
         round(ln((greatest(CAST(cb.c2 AS DOUBLE) - {_KN_D}, 0.0)
                   + {_KN_D} * cf.t1
                     * (CAST(cont.n_end AS DOUBLE) / bt.n_types))
                  / cf.c1), 6) AS logp
  FROM cb
  JOIN cf ON cf.w1 = cb.w1
  JOIN cont ON cont.w2 = cb.w2
  CROSS JOIN bt
)
SELECT big.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       -{SUMD('lp.logp', 6, 18, 6)} / COUNT(*) AS ce_kn
FROM big JOIN lp ON lp.w1 = big.w1 AND lp.w2 = big.w2
GROUP BY big.doc_id
"""


@register("lm_kn_perplexity", _KN_ORACLE)
def lm_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy under an interpolated KNESER-NEY bigram LM
    (fixed discount 0.75) — the smoothing family production LM filters
    (KenLM / CCNet's actual scorer) use, upgrading add-one's systematic
    over-penalty of unseen-but-plausible continuations: probability
    mass is discounted from observed bigrams and redistributed by HOW
    MANY CONTEXTS a word completes (its continuation count), not raw
    frequency.

    Plan shape: identical skeleton to lm_bigram_perplexity (in-row
    bigram build; the only data-sized shuffles are the (w1,w2) count
    and the per-doc regroup).  The KN extras — continuation counts and
    the bigram-type total — are vocabulary-sized aggregates of the
    ALREADY-counted cb frame (no second corpus pass), joined onto the
    vocabulary-sized LM frame, broadcast-scale at any corpus size."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    arr = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("w"),
    )
    from go_pulsar_elasticsearch_spark.functions.caching import (
        checkpoint_slot,
    )

    # `big` feeds the LM count AND the per-doc scoring join, `cb` feeds
    # four downstream aggregates — checkpoint both so the corpus
    # explode and the (w1,w2) count run once each, not once per
    # consumer (r8 opt; guide §3.3)
    big = checkpoint_slot(
        "kn_big",
        arr.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> struct(w[i] AS w1, w[i + 1] AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2"),
    )
    cb = checkpoint_slot(
        "kn_cb", big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    )
    cf = cb.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("t1")
    )
    cont = cb.groupBy("w2").agg(F.count("*").alias("n_end"))
    bt = cb.agg(F.count("*").alias("n_types"))
    p = (
        F.greatest(F.col("c2").cast("double") - F.lit(_KN_D), F.lit(0.0))
        + F.lit(_KN_D)
        * F.col("t1")
        * (F.col("n_end").cast("double") / F.col("n_types"))
    ) / F.col("c1")
    lp = (
        cb.join(cf, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(bt))
        .select("w1", "w2", F.round(F.log(p), 6).alias("logp"))
    )
    return (
        big.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            dsum("logp", 6, 18, out_scale=6).alias("_slp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (-F.col("_slp") / F.col("n_bigrams")).alias("ce_kn"),
        )
    )
