"""UDF surface: Arrow-batched pandas UDFs (scalar + grouped-map).

The rule at scale: row-at-a-time Python UDFs are banned from hot paths
(~10-100x slower than Arrow-batched); everything Python goes through
pandas_udf / applyInPandas / mapInPandas.  Both operators here are
deterministic and certified against SQL twins — proving the UDF path
computes exactly what the declarative path would.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# scalar pandas UDF
# --------------------------------------------------------------------------


@pandas_udf(LongType())
def pd_word_count(texts: pd.Series) -> pd.Series:
    """Vectorized word count over an Arrow batch."""
    return texts.str.split(" ").str.len().astype("int64")


_SCALAR_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS pd_words,
       CAST(len(string_split(text, ' ')) AS BIGINT) * 2 AS pd_words_x2
FROM documents
"""


@register("udf_scalar_pandas", _SCALAR_ORACLE)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow batches) certified against the equivalent
    SQL expression — same answer, Python path."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        pd_word_count("text").alias("pd_words"),
        (pd_word_count("text") * 2).alias("pd_words_x2"),
    )


# --------------------------------------------------------------------------
# grouped-map (applyInPandas) — UDAF/UDTF-shaped
# --------------------------------------------------------------------------

_GROUPED_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_docs", LongType()),
        StructField("total_chars", LongType()),
        StructField("avg_chars", DoubleType()),
    ]
)


def _lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    n = len(pdf)
    total = int(pdf["n_chars"].sum())
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [n],
            "total_chars": [total],
            # float64 division == SQL double division, bit-exact
            "avg_chars": [total / n],
        }
    )


_GROUPED_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY lang
"""


@register("udf_grouped_map", _GROUPED_ORACLE)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-language aggregate computed in
    pandas, certified against the SQL GROUP BY.  Shuffles once on the
    group key like any aggregate; each group must fit in executor memory
    (fine for bounded key domains like language codes — for unbounded
    keys use a two-level pre-aggregation)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return docs.select("lang", "n_chars").groupBy("lang").applyInPandas(
        _lang_stats, schema=_GROUPED_SCHEMA
    )


# --------------------------------------------------------------------------
# Python UDTF (table function) — the third UDF shape
# --------------------------------------------------------------------------

_CHUNK_WORDS = 10

_UDTF_ORACLE = f"""
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_idx,
       array_to_string(w[(i * {_CHUNK_WORDS} + 1):((i + 1) * {_CHUNK_WORDS})], ' ')
         AS chunk
FROM (
  SELECT doc_id, w,
         unnest(range(0, CAST(ceil(len(w) / {_CHUNK_WORDS}.0) AS BIGINT))) AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
"""


@register("udtf_chunk_docs", _UDTF_ORACLE)
def udtf_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (lateral table function): split each doc into
    non-overlapping 10-word chunks, one output row per chunk — the
    API-surface proof for pyspark's third UDF shape (scalar pandas and
    grouped-map live above; see doc_chunk_overlap for the pure-SQL
    overlapping-window equivalent that the hot path should use).

    The UDTF runs per-row in a lateral join — no shuffle; Python cost
    is the usual serialize boundary, which is why the certified SQL
    twin exists: identical semantics, JVM-only plan."""
    from pyspark.sql.functions import udtf

    tune(spark)

    @udtf(returnType="doc_id: bigint, chunk_idx: int, chunk: string",
          useArrow=True)
    class ChunkDoc:
        def eval(self, doc_id, text):
            words = text.split(" ")
            for i in range(0, len(words), _CHUNK_WORDS):
                yield doc_id, i // _CHUNK_WORDS, " ".join(
                    words[i : i + _CHUNK_WORDS]
                )

    spark.udtf.register("gpe_chunk_doc", ChunkDoc)
    t(spark, sf_dir, "documents").createOrReplaceTempView("gpe_udtf_docs")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk "
        "FROM gpe_udtf_docs, LATERAL gpe_chunk_doc(doc_id, text) c"
    )


# --------------------------------------------------------------------------
# udtf_ngrams_analyze  (polymorphic UDTF: output schema from analyze())
# --------------------------------------------------------------------------

_NGRAM_ANALYZE_ORACLE = """
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] AS w0, w[i + 1] AS w1
FROM (
  SELECT doc_id, w, unnest(range(1, len(w))) AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 2
)
"""


@register("udtf_ngrams_analyze", _NGRAM_ANALYZE_ORACLE)
def udtf_ngrams_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 `analyze()`): the n-gram width
    is a literal ARGUMENT, and the output schema — one `w{i}` column
    per gram position — is computed at PLAN time from it, so the same
    function serves bigram/trigram/any-gram call sites with typed
    columns instead of an array.  Certified here at n=2 against the
    SQL bigram expansion; eval itself is width-generic.

    Same lateral-join shape as udtf_chunk_docs: per-row, no shuffle."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeResult

    tune(spark)

    @udtf(useArrow=True)
    class NgramExplode:
        @staticmethod
        def analyze(doc_id, text, n):
            if not isinstance(n.value, int):
                raise ValueError(
                    "gpe_ngrams: n must be a constant integer (the "
                    "output schema is computed from it at plan time)"
                )
            width = int(n.value)
            fields = [
                StructField("doc_id", LongType()),
                StructField("pos", IntegerType()),
            ] + [StructField(f"w{i}", StringType()) for i in range(width)]
            return AnalyzeResult(schema=StructType(fields))

        def eval(self, doc_id, text, n):
            words = (text or "").split(" ")
            for i in range(len(words) - n + 1):
                yield (doc_id, i, *words[i : i + n])

    spark.udtf.register("gpe_ngrams", NgramExplode)
    t(spark, sf_dir, "documents").createOrReplaceTempView("gpe_ngram_docs")
    return spark.sql(
        "SELECT g.doc_id, g.pos, g.w0, g.w1 "
        "FROM gpe_ngram_docs d, LATERAL gpe_ngrams(d.doc_id, d.text, 2) g"
    )
