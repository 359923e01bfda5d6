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
