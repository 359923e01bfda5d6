"""Embedding clustering: k-means over the `embeddings` table.

  kmeans_assign — one Lloyd assignment step against k=4 deterministic
                  integer centroids (md5-derived, same trick as the LSH
                  hyperplanes in similarity.py): every vector to its
                  nearest centroid by squared L2, with the distance.
                  Fully hash-certified vs DuckDB — the dot products use
                  the exact-decimal accumulation of similarity.py, so
                  the argmin is bit-identical cross-engine.
  kmeans_train  — three full Lloyd iterations (assign -> recompute
                  means -> reassign), returning final cluster sizes +
                  inertia.  Iterative, so certified by pytest
                  invariants (determinism, non-increasing inertia)
                  rather than a SQL oracle.

100 TB posture: each Lloyd iteration is one narrow assignment pass
(centroids broadcast as literals / a tiny cached frame) + one groupBy
on cluster_id (k groups — trivially skew-free at k<<cores after the
map-side partial aggregation of per-position sums).  The driver only
ever materializes k x dim floats per iteration, never data rows;
iteration count is the only serial dimension, exactly as on a real
cluster.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.similarity import _DIM, _DOT_SQL, _dot
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_K = 4


def _centroid_weights() -> list[list[int]]:
    """k x dim integer centroids from md5('c:<k>:<dim>') hex digit - 8,
    mirroring the oracle SQL literal; data-independent."""
    return [
        [
            int(hashlib.md5(f"c:{c}:{i}".encode()).hexdigest()[0], 16) - 8
            for i in range(1, _DIM + 1)
        ]
        for c in range(_K)
    ]


def _centroid_values_sql() -> str:
    rows = ", ".join(
        f"({c}, {w})" for c, w in enumerate(_centroid_weights())
    )
    return f"(VALUES {rows}) AS c(cid, ce)"


_ASSIGN_ORACLE = f"""
WITH dots AS (
  SELECT vec_id, cid,
         {_DOT_SQL('embedding', 'embedding')} AS n2,
         {_DOT_SQL('embedding', 'ce')} AS vc,
         {_DOT_SQL('ce', 'ce')} AS c2
  FROM (
    SELECT e.vec_id, e.embedding, c.cid, c.ce,
           unnest(range(1, {_DIM + 1})) AS i
    FROM embeddings e CROSS JOIN {_centroid_values_sql()}
  )
  GROUP BY vec_id, cid
),
scored AS (
  SELECT vec_id, cid, n2 - 2 * vc + c2 AS dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY n2 - 2 * vc + c2 ASC, cid ASC) AS rk
  FROM dots
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id,
       ROUND(dist, 6) AS dist
FROM scored WHERE rk = 1
"""


@register("kmeans_assign", _ASSIGN_ORACLE)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment for k=4 md5-derived integer
    centroids.  ||v - c||^2 expands to v.v - 2 v.c + c.c so each of
    the k distances is one exact-decimal dot against a literal array —
    a narrow projection per row, no join, no explode; the argmin is a
    least() chain resolved inside the same codegen span."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    cents = _centroid_weights()
    n2 = _dot("embedding", "embedding")
    df = emb.withColumn("n2", n2)
    # dist_c = n2 - 2*(v.c) + c.c per centroid, then argmin(dist, cid)
    for c, w in enumerate(cents):
        warr = "array(" + ", ".join(str(x) for x in w) + ")"
        vc = _dot("embedding", warr)
        c2 = float(sum(x * x for x in w))
        df = df.withColumn(f"d{c}", F.col("n2") - 2 * vc + F.lit(c2))
    dist_struct = F.least(
        *[
            F.struct(F.col(f"d{c}").alias("dist"), F.lit(c).cast("bigint").alias("cid"))
            for c in range(_K)
        ]
    )
    return df.select(
        "vec_id",
        dist_struct.getField("cid").alias("cluster_id"),
        F.round(dist_struct.getField("dist"), 6).alias("dist"),
    )


# --------------------------------------------------------------------------
# kmeans_train  (iterative — pytest-certified)
# --------------------------------------------------------------------------

_ITERS = 3


def lloyd_iterations(emb: DataFrame, iters: int = _ITERS) -> DataFrame:
    """Run `iters` Lloyd iterations from the deterministic integer
    centroids; returns (vec_id, cluster_id, dist) after the last
    assignment.  Centroid recomputation is a posexplode + groupBy
    (cluster, position) mean — the classic distributed k-means shape;
    the k x dim result is collected to the driver (tiny) and re-inlined
    as literals so the next assignment stays a narrow projection."""
    cents: list[list[float]] = [[float(x) for x in row] for row in _centroid_weights()]
    assigned = None
    for _ in range(iters):
        df = emb.withColumn("n2", _dot("embedding", "embedding"))
        for c, w in enumerate(cents):
            warr = "array(" + ", ".join(repr(x) for x in w) + ")"
            vc = _dot("embedding", warr)
            c2 = float(sum(x * x for x in w))
            df = df.withColumn(f"d{c}", F.col("n2") - 2 * vc + F.lit(c2))
        pick = F.least(
            *[
                F.struct(
                    F.col(f"d{c}").alias("dist"),
                    F.lit(c).cast("bigint").alias("cid"),
                )
                for c in range(len(cents))
            ]
        )
        assigned = df.select(
            "vec_id",
            "embedding",
            pick.getField("cid").alias("cluster_id"),
            pick.getField("dist").alias("dist"),
        )
        # new centroids: per-(cluster, position) mean — k x dim rows max
        means = (
            assigned.select(
                "cluster_id", F.posexplode("embedding").alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in cents]
        for row in means:
            new_cents[row["cluster_id"]][row["pos"]] = float(row["m"])
        cents = new_cents
    return assigned.select("vec_id", "cluster_id", "dist")


@register("kmeans_train")
def kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three Lloyd iterations over `embeddings`; returns per-cluster
    size and summed squared distance (inertia) after the final
    assignment.  Iterative (driver loops over k x dim centroid
    literals), so no SQL oracle — tests/test_clustering.py certifies
    determinism and that inertia never increases across iterations."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    final = lloyd_iterations(emb)
    return final.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.sum("dist"), 4).alias("inertia"),
    )
