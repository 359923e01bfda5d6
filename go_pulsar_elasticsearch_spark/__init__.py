"""PySpark-native analytics engine with the data-processing capabilities of
javiramos1/go-pulsar-elasticsearch, rebuilt Spark-first.

The reference (851 LoC Go) is a Pulsar -> Elasticsearch streaming ETL
connector (see SURVEY.md).  This package re-expresses its pipeline as
Structured Streaming + DataFrame transforms, and extends it with the full
relational operator surface of SURVEY.md §2B plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis) —
every operator designed for 100 TB scale:

- declarative DataFrame plans (Catalyst predicate pushdown / column pruning)
- broadcast hints only for genuinely small dimensions
- no ``collect()`` on data paths
- AQE enabled for runtime skew / join re-planning
- Python only via Arrow-batched pandas UDFs, never row-at-a-time
"""

from go_pulsar_elasticsearch_spark.registry import ORACLES, QUERIES, register

__all__ = ["QUERIES", "ORACLES", "register", "load_all"]

_LOADED = False


def load_all() -> None:
    """Import every operator module so their @register decorators run."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effectful: each module registers its queries.
    from go_pulsar_elasticsearch_spark.operators import (  # noqa: F401
        aggregates,
        es_aggs,
        es_aggs2,
        es_aggs3,
        es_bucket_aggs,
        es_loop,
        es_metric_aggs,
        es_pipeline_aggs,
        events_analytics,
        geo,
        joins,
        nested,
        pandas_api,
        pulsar_loop,
        rangejoin,
        relational,
        reshape,
        setops,
        sqlapi,
        sortlimit,
        temporal,
        timeseries,
        tpch,
        tpch2,
        tpch3,
        windows,
        windows2,
    )
    from go_pulsar_elasticsearch_spark import ingest  # noqa: F401
    from go_pulsar_elasticsearch_spark.ingest import avro  # noqa: F401
    from go_pulsar_elasticsearch_spark.ingest import pipeline  # noqa: F401
    from go_pulsar_elasticsearch_spark.ingest import urlnorm  # noqa: F401
    from go_pulsar_elasticsearch_spark.ingest import warc  # noqa: F401
    from go_pulsar_elasticsearch_spark.ingest import (  # noqa: F401
        crawl_pipeline,
    )
    from go_pulsar_elasticsearch_spark.ingest import html_extract  # noqa: F401
    from go_pulsar_elasticsearch_spark.llm import (  # noqa: F401
        ann_index,
        bpe,
        classifier,
        clustering,
        components,
        corpus,
        curation,
        decontamination,
        dedup,
        domains,
        hybrid,
        lm_score,
        multimodal,
        pca,
        quality,
        query_dsl,
        query_string,
        sampling,
        search,
        search_ext,
        search_ext2,
        search_ext3,
        search_template,
        similarity,
        text_analysis,
        udfs,
        unigram,
        wordpiece,
    )
    from go_pulsar_elasticsearch_spark.streaming import joins as sjoins  # noqa: F401
    from go_pulsar_elasticsearch_spark.streaming import stream  # noqa: F401
    from go_pulsar_elasticsearch_spark.streaming import url_dedup  # noqa: F401
    from go_pulsar_elasticsearch_spark.streaming import windows as swindows  # noqa: F401

    _LOADED = True
