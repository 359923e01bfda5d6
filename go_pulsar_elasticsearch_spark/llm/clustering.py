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


def _centroid_floats() -> list[list[float]]:
    """Integer weights / 64: embedding elements live in ~[-0.5, 0.5], so
    the usable centroid scale is fractional; /64 is dyadic — the doubles
    are exact and identical in both engines."""
    return [[x / 64.0 for x in row] for row in _centroid_weights()]


def _centroid_values_sql() -> str:
    rows = ", ".join(
        "(" + str(c) + ", [" + ", ".join(repr(x) for x in w) + "])"
        for c, w in enumerate(_centroid_floats())
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
    cents = _centroid_floats()
    n2 = _dot("embedding", "embedding")
    df = emb.withColumn("n2", n2)
    # dist_c = n2 - 2*(v.c) + c.c per centroid, then argmin(dist, cid)
    for c, w in enumerate(cents):
        warr = "array(" + ", ".join(repr(x) for x in w) + ")"
        vc = _dot("embedding", warr)
        df = df.withColumn(f"d{c}", F.col("n2") - 2 * vc + F.lit(_c2_exact(w)))
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

# Exact c2 = sum_i ci^2, replicating the oracle's decimal accumulation on
# the driver: each square (an IEEE double product, identical in python and
# SQL) is rounded half-away-from-zero at 12 decimals, summed exactly as
# decimals, and only then converted back to double — the same value
# DuckDB's CAST(SUM(CAST(ci*ci AS DECIMAL(18,12))) AS DOUBLE) yields.
from decimal import ROUND_HALF_UP, Decimal

_Q12 = Decimal(1).scaleb(-12)


def _c2_exact(w: list[float]) -> float:
    return float(
        sum(Decimal(x * x).quantize(_Q12, rounding=ROUND_HALF_UP) for x in w)
    )


def lloyd_iterations(emb: DataFrame, iters: int = _ITERS) -> DataFrame:
    """Run `iters` Lloyd iterations from the deterministic integer
    centroids; returns (vec_id, cluster_id, dist) after the last
    assignment.  Centroid recomputation is a posexplode + groupBy
    (cluster, position) EXACT-decimal mean — the classic distributed
    k-means shape; the k x dim result is collected to the driver (tiny)
    and re-inlined as literals so the next assignment stays a narrow
    projection.  Every numeric step (dot products, means, c2) uses the
    shared exact-decimal accumulation, so the whole iterative run is
    bit-identical cross-engine and kmeans_train carries a full SQL
    oracle (3 unrolled CTE iterations)."""
    from go_pulsar_elasticsearch_spark.functions.exact import dsum

    # init = integer weights / 64: embedding elements live in ~[-0.5, 0.5],
    # so unscaled integer centroids would capture everything into one
    # cluster on the first step.  /64 is dyadic — exact in both engines.
    cents: list[list[float]] = [
        [x / 64.0 for x in row] for row in _centroid_weights()
    ]
    from go_pulsar_elasticsearch_spark.functions.caching import (
        checkpoint_slot,
    )

    # (vec_id, embedding, n2) is iteration-invariant but was rebuilt
    # from the scan for every assignment AND every means pass (~7
    # executions across 3 iterations); checkpoint it once — each
    # iteration's plan then starts at a leaf instead of re-deriving the
    # scan + dot product, and the driver stops re-analyzing a lineage
    # that doubles per iteration (r8 opt; guide §3.3/§5)
    base = checkpoint_slot(
        "kmeans_base", emb.withColumn("n2", _dot("embedding", "embedding"))
    )
    assigned = None
    for _ in range(iters):
        df = base
        for c, w in enumerate(cents):
            warr = "array(" + ", ".join(repr(x) for x in w) + ")"
            vc = _dot("embedding", warr)
            df = df.withColumn(
                f"d{c}", F.col("n2") - 2 * vc + F.lit(_c2_exact(w))
            )
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
        # new centroids: per-(cluster, position) exact mean — k x dim rows
        means = (
            assigned.select(
                "cluster_id", F.posexplode("embedding").alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    dsum(F.col("x").cast("double"), scale=12, out_scale=12)
                    / F.count("x")
                ).alias("m")
            )
            .collect()
        )
        new_cents = [list(c) for c in cents]
        for row in means:
            new_cents[row["cluster_id"]][row["pos"]] = float(row["m"])
        cents = new_cents
    return assigned.select("vec_id", "cluster_id", "dist")


def _kmeans_train_oracle(iters: int = _ITERS) -> str:
    """Generate the unrolled Lloyd-iteration oracle: cent0 literals ->
    (dots -> assign -> mean -> cent) x iters -> sizes + exact inertia."""
    cent_rows = ", ".join(
        f"({c}, {i}, CAST({w} AS DOUBLE) / 64)"
        for c, row in enumerate(_centroid_weights())
        for i, w in enumerate(row, start=1)
    )
    parts = [
        f"""WITH elems AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i
        FROM embeddings)
), n2 AS (
  SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(18,12))) AS DOUBLE) AS n2
  FROM elems GROUP BY vec_id
), grid AS (
  SELECT cid, i FROM (SELECT DISTINCT cid FROM (VALUES {cent_rows}) c0(cid, i, ci))
  CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS i)
), cent0 AS (
  SELECT cid, i, ci FROM (VALUES {cent_rows}) c0(cid, i, ci)
)"""
    ]
    for it in range(1, iters + 1):
        prev = f"cent{it - 1}"
        parts.append(
            f""", dots{it} AS (
  SELECT e.vec_id, c.cid,
         CAST(SUM(CAST(e.x * c.ci AS DECIMAL(18,12))) AS DOUBLE) AS vc
  FROM elems e JOIN {prev} c USING (i)
  GROUP BY e.vec_id, c.cid
), c2_{it} AS (
  SELECT cid, CAST(SUM(CAST(ci * ci AS DECIMAL(18,12))) AS DOUBLE) AS c2
  FROM {prev} GROUP BY cid
), assign{it} AS (
  SELECT vec_id, cid, dist FROM (
    SELECT n2.vec_id, d.cid, n2.n2 - 2 * d.vc + c2.c2 AS dist,
           ROW_NUMBER() OVER (PARTITION BY n2.vec_id
                              ORDER BY n2.n2 - 2 * d.vc + c2.c2 ASC, d.cid ASC
                             ) AS rk
    FROM dots{it} d
    JOIN n2 ON n2.vec_id = d.vec_id
    JOIN c2_{it} c2 ON c2.cid = d.cid
  ) WHERE rk = 1
), mean{it} AS (
  SELECT a.cid, e.i,
         CAST(SUM(CAST(e.x AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS m
  FROM assign{it} a JOIN elems e ON e.vec_id = a.vec_id
  GROUP BY a.cid, e.i
), cent{it} AS (
  SELECT g.cid, g.i, COALESCE(m.m, p.ci) AS ci
  FROM grid g
  JOIN {prev} p ON p.cid = g.cid AND p.i = g.i
  LEFT JOIN mean{it} m ON m.cid = g.cid AND m.i = g.i
)"""
        )
    parts.append(
        f"""
SELECT CAST(cid AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(ROUND(SUM(CAST(dist AS DECIMAL(18,6))), 4) AS DOUBLE) AS inertia
FROM assign{iters}
GROUP BY cid"""
    )
    return "".join(parts)


@register("kmeans_train", _kmeans_train_oracle())
def kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three Lloyd iterations over `embeddings`; returns per-cluster
    size and summed squared distance (inertia) after the final
    assignment.  Fully oracled: every iteration's means/dots/c2 use the
    exact-decimal accumulation, so the unrolled-CTE DuckDB twin
    reproduces the identical trajectory; tests/test_clustering.py
    additionally certifies determinism and non-increasing inertia."""
    from go_pulsar_elasticsearch_spark.functions.exact import dsum

    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    final = lloyd_iterations(emb)
    return final.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        dsum("dist", scale=6, out_scale=4).alias("inertia"),
    )
