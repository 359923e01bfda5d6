"""connected_components unit semantics: the star-contraction pre-step
must label every node with its component MINIMUM on shapes where
contraction behaves differently — cliques (collapse in one round),
long chains (survive contraction, exercise the propagation loop), and
mixed graphs."""

from __future__ import annotations

from go_pulsar_elasticsearch_spark.llm.components import (
    connected_components,
)


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_clique_chain_and_singleton_edge(spark):
    # clique {1,2,3,4}, chain 10-11-12-13-14, pair {20,21}
    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    chain = [(10, 11), (11, 12), (12, 13), (13, 14)]
    got = _labels(spark, clique + chain + [(21, 20)])
    want = {n: 1 for n in (1, 2, 3, 4)}
    want.update({n: 10 for n in (10, 11, 12, 13, 14)})
    want.update({20: 20, 21: 20})
    assert got == want


def test_two_cliques_bridged(spark):
    # bridge connects two cliques: contraction maps each clique to its
    # min, then the bridge edge keeps them in one component
    c1 = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    c2 = [(a, b) for a in (7, 8, 9) for b in (7, 8, 9) if a < b]
    got = _labels(spark, c1 + c2 + [(3, 7)])
    assert got == {n: 1 for n in (1, 2, 3, 7, 8, 9)}


def test_long_path_needs_propagation(spark):
    # a 12-node path: contraction halves it at best; the loop must
    # still converge to the global minimum at the far end
    path = [(i, i + 1) for i in range(100, 111)]
    got = _labels(spark, path)
    assert got == {n: 100 for n in range(100, 112)}


def test_split_leakage_safe_never_straddles_clusters(spark, sf_dir):
    """The whole point of the op: every near-dup component lands on ONE
    side of the split, and every doc is assigned exactly once."""
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.llm.components import (
        split_leakage_safe,
    )

    out = split_leakage_safe(spark, sf_dir).cache()
    total = out.count()
    docs = spark.read.parquet(sf_dir + "/documents.parquet").count()
    assert total == docs  # one assignment per doc
    straddlers = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .count()
    )
    assert straddlers == 0
    sides = {r["split"] for r in out.select("split").distinct().collect()}
    assert sides <= {"train", "test"} and "train" in sides
    out.unpersist()
