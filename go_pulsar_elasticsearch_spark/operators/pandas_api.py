"""Pandas API on Spark as a first-class query surface.

The engine's third dialect (after DataFrame and SQL text): a
pandas-shaped program — ``ps.read_parquet`` -> ``groupby`` -> ``agg``
-> ``rename`` — that compiles to the SAME Catalyst plan family as the
native operators and is hash-certified against the SQL oracle like any
other query.  The point for a migrating user: analyst pandas code runs
distributed with ZERO Python-row execution (the plan is pure JVM
aggregation; see PLANS.md — no arrow-python flag), because pandas-on-
Spark translates column expressions to Catalyst, it does not ship rows
to pandas.

Scale notes: the default pandas-on-Spark index type ('sequence') would
materialize a GLOBAL order — a single-partition window at 100 TB; the
operator pins 'distributed' (no ordering guarantee, no global state),
which is also the right production default.  The index is dropped at
``to_spark()`` anyway — certified output is pure columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_PS_ORACLE = """
SELECT lang,
       CAST(COUNT(doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang
"""


@register("pandas_api_surface", _PS_ORACLE)
def pandas_api_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    import pyspark.pandas as ps

    prev = ps.get_option("compute.default_index_type")
    ps.set_option("compute.default_index_type", "distributed")
    try:
        psdf = ps.read_parquet(f"{sf_dir}/documents.parquet")
        out = (
            psdf.groupby("lang", as_index=False)
            .agg({"doc_id": "count", "n_chars": ["sum", "max"]})
        )
        # flatten the pandas MultiIndex columns the idiomatic way
        out.columns = ["lang", "n_docs", "total_chars", "max_chars"]
        sdf = out.to_spark()
    finally:
        ps.set_option("compute.default_index_type", prev)
    from pyspark.sql import functions as F

    return sdf.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("max_chars").cast("long").alias("max_chars"),
    )
