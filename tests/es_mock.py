"""Back-compat shim: the mock ES cluster now lives in the package
(sources/es_mock_cluster.py) so the certified es_roundtrip_query
operator can stand it up outside of pytest."""

from go_pulsar_elasticsearch_spark.sources.es_mock_cluster import (  # noqa: F401
    MockEsState,
    make_server,
)
