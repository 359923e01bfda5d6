"""k-means invariants that the SQL oracle can't express (iterative
driver loop): determinism across reruns and Lloyd's monotone inertia."""

from __future__ import annotations

from pyspark.sql import functions as F

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.clustering import lloyd_iterations

gpe.load_all()


def test_kmeans_train_deterministic(spark, sf_dir):
    a = gpe.QUERIES["kmeans_train"](spark, sf_dir).orderBy("cluster_id").collect()
    b = gpe.QUERIES["kmeans_train"](spark, sf_dir).orderBy("cluster_id").collect()
    assert a == b
    assert sum(r["n_members"] for r in a) == t(spark, sf_dir, "embeddings").count()


def test_lloyd_inertia_never_increases(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    inertias = []
    for iters in (1, 2, 3):
        total = (
            lloyd_iterations(emb, iters=iters)
            .agg(F.sum("dist").alias("s"))
            .collect()[0]["s"]
        )
        inertias.append(total)
    # allow tiny float slack; Lloyd can only decrease the objective
    assert inertias[1] <= inertias[0] + 1e-6
    assert inertias[2] <= inertias[1] + 1e-6


def test_assign_matches_first_train_iteration(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    via_train = lloyd_iterations(emb, iters=1).select("vec_id", "cluster_id")
    via_assign = gpe.QUERIES["kmeans_assign"](spark, sf_dir).select(
        "vec_id", "cluster_id"
    )
    assert via_train.subtract(via_assign).count() == 0
    assert via_assign.subtract(via_train).count() == 0
