"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Three operators:
  similarity_topk        — brute-force exact cosine top-k (the baseline)
  ann_lsh_bucketed       — random-hyperplane LSH bucket join (the scale
                           path: candidates share a 12-bit code, so the
                           join is equi on the code, never all-pairs)
  embedding_cosine_neardup — near-duplicate pairs by cosine, blocked on
                           `label` (the blocking key stands in for any
                           coarse pre-cluster at scale)

Exactness strategy: dot products and norms accumulate per-element
products as DECIMAL(18,12) (exact, order-independent) so cosine is
bit-identical across engines — all three operators are fully oracled,
including the ANN path (its hyperplanes are integer-weight and derived
from md5, so bucket codes are deterministic too).

100 TB posture: brute-force is O(Q·N·d) and exists as the correctness
baseline + re-ranker; the LSH operator is the shape that scales — code
assignment is a narrow per-row pass (planes broadcast), and the
candidate join shuffles on the bucket code.  For real workloads raise
planes-per-band / add multi-probe; the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.caching import (
    cache_slot,
    checkpoint_slot,
)
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_DIM = 64

# Exact decimal dot product of two float arrays (Spark SQL expression):
# cast each element to double, multiply, round to DECIMAL(18,12) (both
# engines round the same double identically at this scale), then add
# decimals — associative, so Spark's evaluation order can't matter.
_DOT_EXPR = (
    "CAST(aggregate(zip_with({a}, {b},"
    " (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(18,12))),"
    " CAST(0 AS DECIMAL(18,12)),"
    " (acc, v) -> CAST(acc + v AS DECIMAL(18,12)))"
    " AS DOUBLE)"
)


def _dot(a: str, b: str) -> F.Column:
    return F.expr(_DOT_EXPR.format(a=a, b=b))


# DuckDB twin: unnest positions, sum the same decimals.
def _DOT_SQL(a: str, b: str) -> str:
    return (
        f"CAST(SUM(CAST(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)"
        f" AS DECIMAL(18,12))) AS DOUBLE)"
    )


# --------------------------------------------------------------------------
# similarity_topk  (brute force, exact)
# --------------------------------------------------------------------------

_TOPK_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
  GROUP BY vec_id
), q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
dots AS (
  SELECT qid, vec_id AS vid, {_DOT_SQL('qe', 'embedding')} AS dot
  FROM (
    SELECT q.qid, q.qe, e.vec_id, e.embedding, unnest(range(1, {_DIM + 1})) AS i
    FROM q, embeddings e
    WHERE e.vec_id <> q.qid
  )
  GROUP BY qid, vec_id
), scored AS (
  SELECT qid, vid, dot / sqrt(nq.n2 * nv.n2) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = qid
  JOIN norms nv ON nv.vec_id = vid
)
SELECT qid, vid, cosine, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
  FROM scored
)
WHERE rk <= 5
"""


@register("similarity_topk", _TOPK_ORACLE)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors (vec_id < 10) against the full
    table.  Dot products stay inside one JVM higher-order-function
    expression (zip_with + aggregate) — no Python, no explode shuffle."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = q.join(emb, F.col("vec_id") != F.col("qid"))
    scored = (
        pairs.select(
            "qid",
            F.col("vec_id").alias("vid"),
            _dot("qe", "embedding").alias("dot"),
        )
        .join(norms.select(F.col("vec_id").alias("qid"), F.col("n2").alias("nq")), "qid")
        .join(norms.select(F.col("vec_id").alias("vid"), F.col("n2").alias("nv")), "vid")
        .select(
            "qid", "vid", (F.col("dot") / F.sqrt(F.col("nq") * F.col("nv"))).alias("cosine")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "vid", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# ann_lsh_bucketed  (random-hyperplane LSH, deterministic planes)
# --------------------------------------------------------------------------

_N_PLANES = 12

# Plane weights: integer in [-8, 7] from the first hex digit of
# md5('p:<plane>:<dim>') — deterministic, identical in both engines.

_ANN_ORACLE = f"""
WITH elems AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
), proj AS (
  SELECT vec_id, p,
    CAST(SUM(CAST((strpos('0123456789abcdef',
                   substr(md5('p:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 9)
              * v AS DECIMAL(18,12))) AS DOUBLE) AS s
  FROM (SELECT vec_id, i, v, unnest(range(0, {_N_PLANES})) AS p FROM elems)
  GROUP BY vec_id, p
), codes AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN s >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS code
  FROM proj GROUP BY vec_id
), norms AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
  GROUP BY vec_id
), q AS (
  SELECT c.vec_id AS qid, c.code, e.embedding AS qe
  FROM codes c JOIN embeddings e ON e.vec_id = c.vec_id
  WHERE c.vec_id < 10
), cand AS (
  SELECT q.qid, q.qe, c.vec_id AS vid, e.embedding AS ve
  FROM q JOIN codes c ON c.code = q.code AND c.vec_id <> q.qid
  JOIN embeddings e ON e.vec_id = c.vec_id
), dots AS (
  SELECT qid, vid, {_DOT_SQL('qe', 've')} AS dot
  FROM (SELECT qid, qe, vid, ve, unnest(range(1, {_DIM + 1})) AS i FROM cand)
  GROUP BY qid, vid
), scored AS (
  SELECT qid, vid, dot / sqrt(nq.n2 * nv.n2) AS cosine
  FROM dots JOIN norms nq ON nq.vec_id = qid JOIN norms nv ON nv.vec_id = vid
)
SELECT qid, vid, cosine, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
      FROM scored)
WHERE rk <= 3
"""


def _plane_weights() -> list[list[int]]:
    """The 12x64 hyperplane matrix, derived from md5 exactly as the
    oracle's SQL does (hex digit of md5('p:<plane>:<dim>') minus 8) —
    data-independent, so it's computed once on the driver and inlined
    as literals (broadcast by the plan, no per-row hashing)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"p:{p}:{i}".encode()).hexdigest()[0], 16) - 8
            for i in range(1, _DIM + 1)
        ]
        for p in range(_N_PLANES)
    ]


@register("ann_lsh_bucketed", _ANN_ORACLE)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: 12 random hyperplanes -> 12-bit bucket code -> candidates are
    bucket-mates only -> exact cosine re-rank, top-3.  The all-pairs scan
    of similarity_topk becomes an equi-join on `code`, and code
    assignment is a single narrow projection (no explode, no shuffle):
    12 zip_with/aggregate expressions against literal weight arrays."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")

    def plane_dot(weights: list[int]) -> F.Column:
        warr = F.array(*[F.lit(w) for w in weights])
        prods = F.zip_with(
            F.col("embedding"), warr,
            lambda x, y: (x.cast("double") * y).cast("decimal(18,12)"),
        )
        return F.aggregate(
            prods,
            F.lit(0).cast("decimal(18,12)"),
            lambda acc, v: (acc + v).cast("decimal(18,12)"),
        ).cast("double")

    code = None
    for p, row in enumerate(_plane_weights()):
        bit = F.when(plane_dot(row) >= 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        code = bit if code is None else code + bit
    codes = emb.select("vec_id", code.alias("code"))
    q = (
        codes.filter(F.col("vec_id") < 10)
        .join(emb, "vec_id")
        .select(F.col("vec_id").alias("qid"), "code", F.col("embedding").alias("qe"))
    )
    cand = (
        q.join(codes.alias("c"), (F.col("c.code") == q.code) & (F.col("c.vec_id") != F.col("qid")))
        .join(emb.alias("e"), F.col("e.vec_id") == F.col("c.vec_id"))
        .select("qid", "qe", F.col("c.vec_id").alias("vid"), F.col("e.embedding").alias("ve"))
    )
    # norms INLINE on the candidate rows: the bucket join leaves a few
    # candidates per query, so recomputing a norm per surviving pair is
    # far cheaper than a norms pass + two joins over ALL N vectors (the
    # exact same decimal expression -> identical doubles either way)
    scored = cand.select(
        "qid",
        "vid",
        (
            _dot("qe", "ve")
            / F.sqrt(_dot("qe", "qe") * _dot("ve", "ve"))
        ).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "vid", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# embedding_cosine_neardup  (blocked near-duplicate pairs)
# --------------------------------------------------------------------------

_NEARDUP_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
  GROUP BY vec_id
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
         a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
), dots AS (
  SELECT id_a, id_b, label, {_DOT_SQL('ea', 'eb')} AS dot
  FROM (SELECT id_a, id_b, label, ea, eb, unnest(range(1, {_DIM + 1})) AS i FROM pairs)
  GROUP BY id_a, id_b, label
)
SELECT id_a, id_b, CAST(label AS INTEGER) AS label,
       dot / sqrt(na.n2 * nb.n2) AS cosine
FROM dots JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
WHERE dot / sqrt(na.n2 * nb.n2) >= 0.3
"""


@register("embedding_cosine_neardup", _NEARDUP_ORACLE)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicates: cosine >= 0.3 within label blocks.
    Blocking turns the quadratic pair scan into per-block quadratics —
    at scale the block key comes from LSH codes (ann_lsh_bucketed) or a
    coarse k-means, same join shape.

    The block-quadratic scan is ONE numpy matmul per label block inside
    applyInPandas (double math, tau - 1e-6 margin so nothing real is
    lost); only the emitted candidates pay the exact DECIMAL(18,12)
    cosine that both certifies the threshold and is the output value —
    ~20x faster than running the decimal dot on every in-block pair."""
    import numpy as np
    import pandas as pd

    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))

    def cand_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        label = pdf["label"].iloc[0]
        m = np.array(list(pdf["embedding"]), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        sims = (m @ m.T) / np.outer(n, n)
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= 0.3 - 1e-6
        ia, ib = ids[iu[0][mask]], ids[iu[1][mask]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "label": np.full(mask.sum(), label, dtype=np.int64),
            }
        )

    cands = (
        emb.select("vec_id", "label", "embedding")
        .groupBy("label")
        .applyInPandas(cand_pairs, "id_a long, id_b long, label long")
    )
    pairs = cands.join(
        emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")),
        "id_a",
    ).join(
        emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")),
        "id_b",
    )
    scored = (
        pairs.select("id_a", "id_b", "label", _dot("ea", "eb").alias("dot"))
        .join(norms.select(F.col("vec_id").alias("id_a"), F.col("n2").alias("na")), "id_a")
        .join(norms.select(F.col("vec_id").alias("id_b"), F.col("n2").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("label").cast("int").alias("label"),
            (F.col("dot") / F.sqrt(F.col("na") * F.col("nb"))).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= 0.3)


# --------------------------------------------------------------------------
# ann_ivf  (inverted-file coarse quantizer, deterministic centroids)
# --------------------------------------------------------------------------

# IVF: every vector is assigned to its nearest coarse centroid (the
# "inverted list"); a query probes only the nprobe nearest lists and
# re-ranks exactly inside them.  Centroids here are the deterministic
# sample vec_id % 50 == 0 (10 lists over 500 vectors) so both engines
# agree bit-for-bit; a production build would k-means them — the plan
# shape (broadcast centroids -> narrow assign pass -> equi-join on
# list id) is identical.

_IVF_STEP = 50   # centroid sample stride -> N/_IVF_STEP lists
_NPROBE = 2

_IVF_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
  GROUP BY vec_id
), cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % {_IVF_STEP} = 0
), adots AS (
  SELECT vec_id, cid, {_DOT_SQL('embedding', 'ce')} AS dot
  FROM (
    SELECT e.vec_id, e.embedding, c.cid, c.ce, unnest(range(1, {_DIM + 1})) AS i
    FROM embeddings e, cents c
  )
  GROUP BY vec_id, cid
), ranked AS (
  SELECT a.vec_id AS vec_id, a.cid AS cid,
    row_number() OVER (
      PARTITION BY a.vec_id
      ORDER BY a.dot / sqrt(nv.n2 * nc.n2) DESC, a.cid
    ) AS crk
  FROM adots a
  JOIN norms nv ON nv.vec_id = a.vec_id
  JOIN norms nc ON nc.vec_id = a.cid
), assign AS (SELECT vec_id, cid FROM ranked WHERE crk = 1),
probes AS (SELECT vec_id AS qid, cid FROM ranked WHERE crk <= {_NPROBE} AND vec_id < 10),
cand AS (
  SELECT p.qid, a.vec_id AS vid, eq.embedding AS qe, ev.embedding AS ve
  FROM probes p
  JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.qid
  JOIN embeddings eq ON eq.vec_id = p.qid
  JOIN embeddings ev ON ev.vec_id = a.vec_id
), dots AS (
  SELECT qid, vid, {_DOT_SQL('qe', 've')} AS dot
  FROM (SELECT qid, vid, qe, ve, unnest(range(1, {_DIM + 1})) AS i FROM cand)
  GROUP BY qid, vid
), scored AS (
  SELECT qid, vid, dot / sqrt(nq.n2 * nv.n2) AS cosine
  FROM dots JOIN norms nq ON nq.vec_id = qid JOIN norms nv ON nv.vec_id = vid
)
SELECT qid, vid, cosine, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
      FROM scored)
WHERE rk <= 3
"""


@register("ann_ivf", _IVF_ORACLE)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN, IVF shape: assign every vector to its nearest coarse centroid,
    probe the _NPROBE nearest lists per query, exact-cosine re-rank top-3.

    Scale posture: centroids are broadcast (K rows), so assignment is a
    map-side cross of each row against K literals — no shuffle; the only
    shuffles are the window over vec_id (bounded: K rows per vector) and
    the candidate equi-join on the list id.  At 100 TB, K grows to
    ~sqrt(N) and assignment stays map-side; the probe join's shuffle key
    (cid) has K distinct values, so lists stay balanced as long as the
    quantizer does — the standard IVF tradeoff."""
    from pyspark.sql import Window

    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    cents = emb.filter(F.col("vec_id") % _IVF_STEP == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    adots = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", _dot("embedding", "ce").alias("dot")
    )
    ranked = (
        adots.join(norms.select(F.col("vec_id"), F.col("n2").alias("nv")), "vec_id")
        .join(
            F.broadcast(norms.select(F.col("vec_id").alias("cid"), F.col("n2").alias("nc"))),
            "cid",
        )
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc(F.col("dot") / F.sqrt(F.col("nv") * F.col("nc"))),
                    F.asc("cid"),
                )
            ),
        )
    )
    assign = ranked.filter(F.col("crk") == 1).select("vec_id", "cid")
    probes = (
        ranked.filter((F.col("crk") <= _NPROBE) & (F.col("vec_id") < 10))
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(
            emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")),
            "qid",
        )
        .join(
            emb.select(F.col("vec_id"), F.col("embedding").alias("ve")),
            "vec_id",
        )
        .select("qid", F.col("vec_id").alias("vid"), "qe", "ve")
    )
    scored = (
        cand.select("qid", "vid", _dot("qe", "ve").alias("dot"))
        .join(norms.select(F.col("vec_id").alias("qid"), F.col("n2").alias("nq")), "qid")
        .join(norms.select(F.col("vec_id").alias("vid"), F.col("n2").alias("nv")), "vid")
        .select("qid", "vid", (F.col("dot") / F.sqrt(F.col("nq") * F.col("nv"))).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "vid", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# embedding_quantize_int8  (scalar quantization, the 4x storage path)
# --------------------------------------------------------------------------

# Per-vector symmetric int8: scale = 127 / max|v|; q_i = trunc(v_i * scale).
# trunc is spelled floor/ceil-by-sign because DuckDB's double->int CAST
# rounds while Spark's truncates — the only non-portable piece.
# Everything here is order-independent IEEE double math (max/abs/floor),
# so no decimal trick is needed.

_QUANT_ORACLE = f"""
WITH elems AS (
  SELECT vec_id, CAST(embedding[i] AS DOUBLE) AS v
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
), scales AS (
  SELECT vec_id, 127.0 / MAX(abs(v)) AS scale
  FROM elems GROUP BY vec_id
), q AS (
  SELECT e.vec_id,
    CASE WHEN e.v * s.scale >= 0 THEN FLOOR(e.v * s.scale)
         ELSE CEIL(e.v * s.scale) END AS qv,
    e.v, s.scale
  FROM elems e JOIN scales s ON s.vec_id = e.vec_id
)
SELECT vec_id,
  CAST(MIN(qv) AS INTEGER) AS q_min,
  CAST(MAX(qv) AS INTEGER) AS q_max,
  MAX(abs(v - qv / scale)) AS max_abs_err
FROM q GROUP BY vec_id
"""


@register("embedding_quantize_int8", _QUANT_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization with reconstruction-error
    accounting — the 4x (fp32->int8) storage/bandwidth lever for 100 TB
    embedding stores; IVF/LSH candidate scans read the int8 codes and
    only the re-rank touches fp32.

    Pure narrow pass: per-row higher-order functions (transform /
    aggregate over the 64-wide array), no shuffle, no Python."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.lit(127.0) / F.array_max(F.transform(vd, F.abs))
    p = F.transform(vd, lambda v: v * scale)
    q = F.transform(
        p, lambda x: F.when(x >= 0, F.floor(x)).otherwise(F.ceil(x)).cast("double")
    )
    err = F.array_max(
        F.zip_with(vd, q, lambda v, qv: F.abs(v - qv / scale))
    )
    return emb.select(
        "vec_id",
        F.array_min(q).cast("int").alias("q_min"),
        F.array_max(q).cast("int").alias("q_max"),
        err.alias("max_abs_err"),
    )


# --------------------------------------------------------------------------
# similarity_topk_fast  (production path: numpy matmul over Arrow batches)
# --------------------------------------------------------------------------


@register("similarity_topk_fast")  # rows-only: float math, certified vs
# the exact-decimal baseline in tests/test_similarity.py
def similarity_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5, production layout: the (small) query set
    is collected once and closed over (a broadcast, not a data-path
    collect); each Arrow batch of the big side does one numpy matmul.
    ~vectorized-C per pair instead of per-element JVM decimal ops —
    the speed path the exact operator certifies.

    At 100 TB the same shape holds: Q stays driver-size (or a broadcast
    join against an LSH-bucketed candidate set, see ann_lsh_bucketed);
    the N side streams through executors in Arrow batches."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows])
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    out_schema = "qid long, vid long, cosine double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vmat = np.array(list(pdf["embedding"]), dtype=np.float64)
            vnorm = np.linalg.norm(vmat, axis=1)
            sims = (qmat @ vmat.T) / np.outer(qnorm, vnorm)
            nq, nv = sims.shape
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, nv),
                    "vid": np.tile(pdf["vec_id"].values, nq),
                    "cosine": sims.ravel(),
                }
            )

    scored = (
        emb.select("vec_id", "embedding")
        .mapInPandas(score, schema=out_schema)
        .filter(F.col("qid") != F.col("vid"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "vid", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# hard_negative_mining  (contrastive-training data prep)
# --------------------------------------------------------------------------

_HN_TOPK = 5

_HN_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, {{dot_self}} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
  GROUP BY vec_id
), q AS (
  SELECT vec_id AS qid, label AS q_label, embedding AS qe
  FROM embeddings WHERE vec_id < 10
), cand AS (
  SELECT q.qid, q.q_label, q.qe, e.vec_id AS vid, e.label AS v_label,
         e.embedding AS ve
  FROM q JOIN embeddings e ON e.label <> q.q_label
), dots AS (
  SELECT qid, q_label, vid, v_label, {{dot_qv}} AS dot
  FROM (SELECT qid, q_label, qe, vid, v_label, ve,
               unnest(range(1, {_DIM + 1})) AS i FROM cand)
  GROUP BY qid, q_label, vid, v_label
), scored AS (
  SELECT qid, CAST(q_label AS INTEGER) AS q_label,
         vid, CAST(v_label AS INTEGER) AS v_label,
         dot / sqrt(nq.n2 * nv.n2) AS cosine
  FROM dots JOIN norms nq ON nq.vec_id = qid JOIN norms nv ON nv.vec_id = vid
)
SELECT qid, q_label, vid, v_label, cosine, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
      FROM scored)
WHERE rk <= {_HN_TOPK}
""".format(
    dot_self=_DOT_SQL("embedding", "embedding"), dot_qv=_DOT_SQL("qe", "ve")
)


@register("hard_negative_mining", _HN_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-5 most-similar vectors with a DIFFERENT label — the
    near-misses an embedding model must learn to separate.  Same exact
    brute-force cosine as similarity_topk with a label-inequality
    predicate; at scale the candidate side is pre-filtered by
    ann_lsh_bucketed codes and this stage only re-ranks."""
    from pyspark.sql import Window

    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"),
    )
    cand = F.broadcast(q).join(emb, F.col("label") != F.col("q_label"))
    scored = (
        cand.select(
            "qid",
            "q_label",
            F.col("vec_id").alias("vid"),
            F.col("label").alias("v_label"),
            _dot("qe", "embedding").alias("dot"),
        )
        .join(norms.select(F.col("vec_id").alias("qid"), F.col("n2").alias("nq")), "qid")
        .join(norms.select(F.col("vec_id").alias("vid"), F.col("n2").alias("nv")), "vid")
        .select(
            "qid",
            F.col("q_label").cast("int").alias("q_label"),
            "vid",
            F.col("v_label").cast("int").alias("v_label"),
            (F.col("dot") / F.sqrt(F.col("nq") * F.col("nv"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HN_TOPK)
        .select("qid", "q_label", "vid", "v_label", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# reciprocal_best_match  (bitext-mining shape: mutual nearest neighbors)
# --------------------------------------------------------------------------

_RBM_A, _RBM_B = 0, 1  # the two "languages" = embedding label groups

_RBM_ORACLE = f"""
WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE label = {_RBM_A}),
b AS (SELECT vec_id, embedding FROM embeddings WHERE label = {_RBM_B}),
na AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM a)
  GROUP BY vec_id
), nb AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM b)
  GROUP BY vec_id
), dots AS (
  SELECT aid, bid, {_DOT_SQL('ae', 'be')} AS dot
  FROM (
    SELECT a.vec_id AS aid, b.vec_id AS bid, a.embedding AS ae,
           b.embedding AS be, unnest(range(1, {_DIM + 1})) AS i
    FROM a, b
  )
  GROUP BY aid, bid
), scored AS (
  SELECT aid, bid, dot / sqrt(na.n2 * nb.n2) AS cosine
  FROM dots JOIN na ON na.vec_id = aid JOIN nb ON nb.vec_id = bid
), fwd AS (
  SELECT aid, bid, cosine,
         row_number() OVER (PARTITION BY aid ORDER BY cosine DESC, bid) AS rk
  FROM scored
), bwd AS (
  SELECT aid, bid,
         row_number() OVER (PARTITION BY bid ORDER BY cosine DESC, aid) AS rk
  FROM scored
)
SELECT f.aid, f.bid, f.cosine
FROM fwd f JOIN bwd w ON f.aid = w.aid AND f.bid = w.bid
WHERE f.rk = 1 AND w.rk = 1
"""


@register("reciprocal_best_match", _RBM_ORACLE)
def reciprocal_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-nearest-neighbor mining between two embedding groups
    (label 0 vs label 1) — the core of bitext / parallel-corpus mining
    (WMT-style margin mining reduces to this at margin 1.0): keep the
    pair (a, b) only when b is a's top cosine match AND a is b's.

    Exact decimal dot products (llm/similarity.py recipe), ties broken
    on the id, so the match set is deterministic.

    100 TB posture: both rankings come from the SAME scored relation —
    one A×B scoring pass (blocked at scale: ann_lsh_bucketed /ann_ivf
    provide the candidate generation), then two thin windows that share
    it; the mutual check is a self-join on the two rank-1 slices, each
    |A|-sized, broadcastable."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("label") == _RBM_A).select(
        F.col("vec_id").alias("aid"), F.col("embedding").alias("ae")
    )
    b = emb.filter(F.col("label") == _RBM_B).select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("be")
    )
    na = a.select("aid", _dot("ae", "ae").alias("na2"))
    nb = b.select("bid", _dot("be", "be").alias("nb2"))
    scored = (
        a.crossJoin(F.broadcast(b))
        .select("aid", "bid", _dot("ae", "be").alias("dot"))
        .join(F.broadcast(na), "aid")
        .join(F.broadcast(nb), "bid")
        .select(
            "aid", "bid",
            (F.col("dot") / F.sqrt(F.col("na2") * F.col("nb2"))).alias("cosine"),
        )
    )
    fwd = Window.partitionBy("aid").orderBy(F.desc("cosine"), F.asc("bid"))
    bwd = Window.partitionBy("bid").orderBy(F.desc("cosine"), F.asc("aid"))
    return (
        scored.withColumn("frk", F.row_number().over(fwd))
        .withColumn("brk", F.row_number().over(bwd))
        .filter((F.col("frk") == 1) & (F.col("brk") == 1))
        .select("aid", "bid", "cosine")
    )


# --------------------------------------------------------------------------
# knn_filtered  (ES 8 kNN-with-filter: metadata predicate BEFORE ranking)
# --------------------------------------------------------------------------

_KNNF_TOPK = 3
_KNNF_LABEL = 2

_KNNF_ORACLE = f"""
WITH cand AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE label = {_KNNF_LABEL}
), norms AS (
  SELECT vec_id, {{dot_self}} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i
        FROM (SELECT vec_id, embedding FROM embeddings))
  GROUP BY vec_id
), q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10
), dots AS (
  SELECT qid, vid, {{dot_qv}} AS dot
  FROM (
    SELECT q.qid, q.qe, c.vec_id AS vid, c.embedding AS ve,
           unnest(range(1, {_DIM + 1})) AS i
    FROM q JOIN cand c ON c.vec_id <> q.qid
  )
  GROUP BY qid, vid
), scored AS (
  SELECT qid, vid, dot / sqrt(nq.n2 * nv.n2) AS cosine
  FROM dots JOIN norms nq ON nq.vec_id = qid JOIN norms nv ON nv.vec_id = vid
)
SELECT qid, vid, cosine, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
      FROM scored)
WHERE rk <= {_KNNF_TOPK}
""".format(
    dot_self=_DOT_SQL("embedding", "embedding"), dot_qv=_DOT_SQL("qe", "ve")
)


@register("knn_filtered", _KNNF_ORACLE)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (ES 8.x `knn` with `filter`): top-3 cosine
    neighbors restricted to candidates with label = 2.  The predicate is
    applied BEFORE ranking (post-filtering would under-fill k) and is
    pushed into the candidate scan — at 100 TB the filter prunes
    partitions/row-groups first, and the ANN bucket path slots in front
    of the exact re-rank unchanged."""
    from pyspark.sql import Window

    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    cand = emb.filter(F.col("label") == _KNNF_LABEL).select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("ve")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        F.broadcast(q)
        .join(cand, F.col("vid") != F.col("qid"))
        .select("qid", "vid", _dot("qe", "ve").alias("dot"))
        .join(norms.select(F.col("vec_id").alias("qid"), F.col("n2").alias("nq")), "qid")
        .join(norms.select(F.col("vec_id").alias("vid"), F.col("n2").alias("nv")), "vid")
        .select(
            "qid", "vid",
            (F.col("dot") / F.sqrt(F.col("nq") * F.col("nv"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNNF_TOPK)
        .select("qid", "vid", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# contrastive_triplets  (anchor, hardest positive, hardest negative)
# --------------------------------------------------------------------------

_TRIP_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, {{dot_self}} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i FROM embeddings)
  GROUP BY vec_id
), q AS (
  SELECT vec_id AS qid, label AS q_label, embedding AS qe
  FROM embeddings WHERE vec_id < 10
), dots AS (
  SELECT qid, q_label, vid, v_label, {{dot_qv}} AS dot
  FROM (
    SELECT q.qid, q.q_label, q.qe, e.vec_id AS vid, e.label AS v_label,
           e.embedding AS ve, unnest(range(1, {_DIM + 1})) AS i
    FROM q JOIN embeddings e ON e.vec_id <> q.qid
  )
  GROUP BY qid, q_label, vid, v_label
), scored AS (
  SELECT qid, q_label, vid, v_label, dot / sqrt(nq.n2 * nv.n2) AS cosine
  FROM dots JOIN norms nq ON nq.vec_id = qid JOIN norms nv ON nv.vec_id = vid
), pos AS (
  SELECT qid, vid AS pos_id, cosine AS pos_cos
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
        FROM scored WHERE v_label = q_label)
  WHERE rk = 1
), neg AS (
  SELECT qid, vid AS neg_id, cosine AS neg_cos
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
        FROM scored WHERE v_label <> q_label)
  WHERE rk = 1
)
SELECT pos.qid AS anchor_id, pos_id, pos_cos, neg_id, neg_cos,
       pos_cos - neg_cos AS margin
FROM pos JOIN neg ON neg.qid = pos.qid
""".format(
    dot_self=_DOT_SQL("embedding", "embedding"), dot_qv=_DOT_SQL("qe", "ve")
)


@register("contrastive_triplets", _TRIP_ORACLE)
def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for contrastive training: per anchor, the hardest
    positive (most-similar SAME label) and hardest negative
    (most-similar different label), with the training margin.  One
    scored pass (query side broadcast), two ranks over the same
    (qid, cosine) sort, self-joined on anchor — the composition of
    similarity_topk and hard_negative_mining a fine-tuning pipeline
    actually ships."""
    from pyspark.sql import Window

    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"),
    )
    cand = F.broadcast(q).join(emb, F.col("vec_id") != F.col("qid"))
    scored = (
        cand.select(
            "qid",
            "q_label",
            F.col("vec_id").alias("vid"),
            F.col("label").alias("v_label"),
            _dot("qe", "embedding").alias("dot"),
        )
        .join(norms.select(F.col("vec_id").alias("qid"), F.col("n2").alias("nq")), "qid")
        .join(norms.select(F.col("vec_id").alias("vid"), F.col("n2").alias("nv")), "vid")
        .select(
            "qid", "q_label", "vid", "v_label",
            (F.col("dot") / F.sqrt(F.col("nq") * F.col("nv"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    pos = (
        scored.filter(F.col("v_label") == F.col("q_label"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("qid").alias("anchor_id"),
                F.col("vid").alias("pos_id"),
                F.col("cosine").alias("pos_cos"))
    )
    neg = (
        scored.filter(F.col("v_label") != F.col("q_label"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("qid").alias("anchor_id"),
                F.col("vid").alias("neg_id"),
                F.col("cosine").alias("neg_cos"))
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id", "pos_id", "pos_cos", "neg_id", "neg_cos",
        (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
    )


# --------------------------------------------------------------------------
# embedding_standardize  (per-dimension z-scoring: the scaling pass before
# clustering / ANN when dimensions have unequal variance)
# --------------------------------------------------------------------------

_STD_ORACLE = f"""
WITH elems AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i
        FROM embeddings)
), moments AS (
  SELECT i,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(x AS DECIMAL(18,12))) AS DOUBLE) AS s1,
    CAST(SUM(CAST(x * x AS DECIMAL(18,12))) AS DOUBLE) AS s2
  FROM elems GROUP BY i
)
SELECT vec_id, CAST(i AS INTEGER) AS dim,
  (x - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS z
FROM elems JOIN moments USING (i)
WHERE i <= 4
"""


@register("embedding_standardize", _STD_ORACLE)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization from exact decimal moments (the
    same portable-moments recipe as anomaly_zscore, per dim instead of
    per user); output restricted to the first 4 dims to keep the
    certified result compact — the full-width variant is the identical
    plan.  One (dim)-keyed moment aggregation (64 groups, map-side
    combined) broadcast back over the elements."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    elems = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "xf"),
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    moments = elems.groupBy("i").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(18,12)")).cast("double").alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(18,12)"))
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    return (
        elems.join(F.broadcast(moments), "i")
        .filter(F.col("i") <= 4)
        .select(
            "vec_id",
            F.col("i").cast("int").alias("dim"),
            ((F.col("x") - mean) / F.sqrt(var)).alias("z"),
        )
    )


# --------------------------------------------------------------------------
# ann_pq  (product quantization: the 100 TB memory story)
# --------------------------------------------------------------------------

_PQ_M = 8        # subspaces (64 dims -> 8 x 8)
_PQ_K = 64       # centroids per subspace -> 6-bit codes
_PQ_ITERS = 4    # Lloyd iterations per subspace
_PQ_RERANK = 100  # exact re-rank depth
_PQ_TOPK = 5


def pq_unit_vectors(emb: DataFrame) -> DataFrame:
    """unit-normalize so inner product == cosine and L2^2 == 2 - 2*cos.

    Checkpointed (r8 opt): every PQ-family op hands this frame to 3-4
    consumers (codebook training, encode, query-vector collect, exact
    re-rank), each of which otherwise re-derives the scan + normalize
    and re-analyzes its lineage; the frame is corpus-sized but narrow
    (id + 64 doubles), exactly what the ops already persisted
    implicitly via their own downstream caches at 100 TB.

    r9 re-measure (VERDICT item 6, the ann_pq_stored watch item): an
    interleaved checkpoint/lazy/checkpoint/lazy A/B (reps=3 each)
    showed the checkpoint WINS for ann_pq_stored (med 1.7-2.0 s vs
    2.4-2.5 s) and ann_ivfpq, ties ann_pq/ann_sq8, and costs
    ann_pq_append ~0.06 s (within noise) — the r8 driver-run regression
    read on the stored variant was host noise, and the checkpoint is
    kept for the whole family rather than plumbing a per-variant
    mode."""
    from go_pulsar_elasticsearch_spark.functions.caching import (
        checkpoint_slot,
    )

    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return checkpoint_slot(
        "pq_unit",
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double") / norm).alias("u"),
        ),
    )


def pq_train_codebooks_df(unit: DataFrame) -> DataFrame:
    """Codebook TRAINING as a DataFrame (sub, cid, centroid): one
    applyInPandas group per subspace (8 numpy Lloyd runs in parallel; at
    corpus scale train on a bounded sample — codebooks are
    sample-stable by design).  Deterministic: Lloyd from a fixed init
    (subvectors of the K lowest vec_ids), no RNG — which is what makes
    a PERSISTED codebook artifact bit-identical to a fresh fit."""
    import numpy as np
    import pandas as pd

    sub_schema = "sub int, cid int, centroid array<double>"

    def train_subspace(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        sub = key[0]
        pdf = pdf.sort_values("vec_id")
        x = np.array(list(pdf["subvec"]), dtype=np.float64)
        cents = x[: _PQ_K].copy()  # deterministic init: K lowest vec_ids
        for _ in range(_PQ_ITERS):
            # argmin ||x-c||^2 == argmin(-2 x.c + ||c||^2): one BLAS
            # matmul instead of an (n, k, d) broadcast temp
            d = -2.0 * (x @ cents.T) + (cents ** 2).sum(axis=1)
            assign = d.argmin(axis=1)
            for c in range(_PQ_K):
                m = assign == c
                if m.any():
                    cents[c] = x[m].mean(axis=0)
        return pd.DataFrame(
            {"sub": sub, "cid": range(_PQ_K), "centroid": list(cents)}
        )

    subvecs = unit.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_PQ_M - 1}), s -> named_struct("
                f"'sub', s, 'subvec', slice(u, s * {64 // _PQ_M} + 1, {64 // _PQ_M})))"
            )
        ).alias("sv"),
    ).select("vec_id", F.col("sv.sub").alias("sub"), F.col("sv.subvec").alias("subvec"))
    return subvecs.groupBy("sub").applyInPandas(train_subspace, sub_schema)


def pq_codebook_array(codebook_rows) -> "object":
    """(sub, cid, centroid) rows -> the (M, K, d/M) numpy codebook."""
    import numpy as np

    cb = np.zeros((_PQ_M, _PQ_K, 64 // _PQ_M))
    for r in codebook_rows:
        cb[r["sub"], r["cid"]] = r["centroid"]
    return cb


def pq_encode_df(unit: DataFrame, cb) -> DataFrame:
    """ENCODE as a transformation: mapInPandas argmin against the
    broadcast codebooks (driver state is MxKxd/M floats, KBs) ->
    (vec_id, codes array<int>)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.array(list(pdf["u"]), dtype=np.float64)
            n, d = x.shape
            xs = x.reshape(n, _PQ_M, d // _PQ_M)
            codes = np.empty((n, _PQ_M), dtype=np.int32)
            for s in range(_PQ_M):
                dist = -2.0 * (xs[:, s, :] @ cb[s].T) + (cb[s] ** 2).sum(axis=1)
                codes[:, s] = dist.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "codes": list(codes)}
            )

    return unit.mapInPandas(encode, "vec_id long, codes array<int>")


def pq_search(coded: DataFrame, unit: DataFrame, cb, qids, qmat) -> DataFrame:
    """SEARCH: ADC over the CODES (8 bytes/vector moves, never the
    embeddings) — per query ONE MxK table of partial squared distances,
    each candidate scored by M table lookups — then the PQ top-100
    re-ranks EXACTLY against the raw vectors (the standard recall
    knob)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    # ADC tables: tables[q, s, c] = ||q_s - centroid_sc||^2
    qs = qmat.reshape(len(qids), _PQ_M, -1)
    tables = ((qs[:, :, None, :] - cb[None]) ** 2).sum(axis=3)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            n = len(codes)
            # gather: approx[q, v] = sum_s tables[q, s, codes[v, s]]
            approx = tables[:, np.arange(_PQ_M)[None, :], codes].sum(axis=2)
            nq = len(qids)
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, n),
                    "vid": np.tile(pdf["vec_id"].values, nq),
                    "approx_d2": approx.ravel(),
                }
            )

    cand_w = Window.partitionBy("qid").orderBy(F.asc("approx_d2"), F.asc("vid"))
    cands = (
        coded.mapInPandas(adc, "qid long, vid long, approx_d2 double")
        .filter(F.col("qid") != F.col("vid"))
        .withColumn("crk", F.row_number().over(cand_w))
        .filter(F.col("crk") <= _PQ_RERANK)
    )
    return pq_exact_rerank(cands.select("qid", "vid"), unit, qids, qmat)


def pq_exact_rerank(cands: DataFrame, unit: DataFrame, qids, qmat,
                    topk: int = _PQ_TOPK) -> DataFrame:
    """Exact re-rank of (qid, vid) candidate pairs: raw-unit-vector
    cosine, top-``topk`` per query — the recall knob every PQ variant
    (full-scan ADC, stored-index, IVF-PQ) shares."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    qn = {int(i): q for i, q in zip(qids, qmat)}

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"qid": [], "vid": [], "cosine": []})
                continue
            v = np.array(list(pdf["u"]), dtype=np.float64)
            q = np.array([qn[int(x)] for x in pdf["qid"]], dtype=np.float64)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].values,
                    "vid": pdf["vid"].values,
                    "cosine": (q * v).sum(axis=1),  # unit vectors
                }
            )

    exact = (
        cands.join(unit.select(F.col("vec_id").alias("vid"), "u"), "vid")
        .select("qid", "vid", "u")
        .mapInPandas(rerank, "qid long, vid long, cosine double")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("qid", "vid", "cosine", "rk")
    )


def pq_adc_score_pairs(pairs: DataFrame, cb, qids, qmat) -> DataFrame:
    """(qid, vid, codes) -> (qid, vid, approx_d2): asymmetric-distance
    scoring of an EXPLICIT candidate pair list against per-query ADC
    tables — the piece IVF-PQ needs, where candidates come from the
    probed coarse lists instead of a full code scan.  Driver state is
    the (nq, M, K) table tensor, KBs."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    qs = qmat.reshape(len(qids), _PQ_M, -1)
    tables = ((qs[:, :, None, :] - cb[None]) ** 2).sum(axis=3)
    qindex = {int(q): i for i, q in enumerate(qids)}

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"qid": [], "vid": [], "approx_d2": []})
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            qi = np.array([qindex[int(x)] for x in pdf["qid"]])
            approx = tables[
                qi[:, None], np.arange(_PQ_M)[None, :], codes
            ].sum(axis=1)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].values,
                    "vid": pdf["vid"].values,
                    "approx_d2": approx,
                }
            )

    return pairs.mapInPandas(adc, "qid long, vid long, approx_d2 double")


def pq_query_vectors(unit: DataFrame):
    """(qids, qmat) for the certified query set (vec_id < 10)."""
    import numpy as np

    qrows = unit.filter(F.col("vec_id") < 10).collect()
    qids = np.array([r["vec_id"] for r in qrows])
    qmat = np.array([r["u"] for r in qrows], dtype=np.float64)
    return qids, qmat


@register("ann_pq")  # rows-only: trained float codebooks; recall vs the
# exact baseline is asserted in tests/test_similarity.py
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011) — the technique that makes
    billion-vector search fit in memory: vectors are unit-normalized,
    split into 8 subspaces of 8 dims, each subspace k-means-quantized to
    64 centroids, so a 256-byte float32 vector stores as 8 six-bit
    codes (+id).  Train/encode/search are the shared module helpers —
    llm/ann_index.py composes the same pieces around a PERSISTED
    parquet index (train-once/probe-many, round-5 VERDICT #2)."""
    tune(spark)
    unit = pq_unit_vectors(t(spark, sf_dir, "embeddings"))
    cb = pq_codebook_array(pq_train_codebooks_df(unit).collect())
    coded = pq_encode_df(unit, cb)
    qids, qmat = pq_query_vectors(unit)
    return pq_search(coded, unit, cb, qids, qmat)


@register("ann_ivfpq")  # rows-only: trained float codebooks like ann_pq;
# recall vs exact asserted in tests/test_similarity.py
def ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the FAISS composition that is the billion-vector
    default (Jegou et al. 2011, §IV): the coarse IVF quantizer bounds
    the candidate set to the _NPROBE probed lists (ann_pq's ADC scans
    EVERY code; at 100 TB that full scan is the bottleneck PQ alone
    doesn't fix), PQ ADC scores only those candidates' 8-byte codes,
    and the ADC top-_PQ_RERANK re-ranks exactly.

    Plan shape: centroid table broadcast (KB), assignment map-side,
    candidate generation one equi-join on the list id, ADC a
    mapInPandas over (qid, vid, codes) triples, re-rank the shared
    pq_exact_rerank.  Nothing scans the full corpus after assignment;
    every moved byte is a code or a probed candidate."""
    from pyspark.sql import Window

    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    unit = pq_unit_vectors(emb)
    # coarse IVF: same deterministic quantizer as ann_ivf
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    cents = emb.filter(F.col("vec_id") % _IVF_STEP == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    adots = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", _dot("embedding", "ce").alias("dot")
    )
    ranked = (
        adots.join(
            norms.select(F.col("vec_id"), F.col("n2").alias("nv")), "vec_id"
        )
        .join(
            F.broadcast(
                norms.select(
                    F.col("vec_id").alias("cid"), F.col("n2").alias("nc")
                )
            ),
            "cid",
        )
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc(F.col("dot") / F.sqrt(F.col("nv") * F.col("nc"))),
                    F.asc("cid"),
                )
            ),
        )
    )
    assign = ranked.filter(F.col("crk") == 1).select("vec_id", "cid")
    probes = ranked.filter(
        (F.col("crk") <= _NPROBE) & (F.col("vec_id") < 10)
    ).select(F.col("vec_id").alias("qid"), "cid")
    # PQ codes for the corpus; candidates = probed lists' members
    cb = pq_codebook_array(pq_train_codebooks_df(unit).collect())
    coded = pq_encode_df(unit, cb)
    qids, qmat = pq_query_vectors(unit)
    pairs = (
        F.broadcast(probes)
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(coded, "vec_id")
        .select("qid", F.col("vec_id").alias("vid"), "codes")
    )
    cand_w = Window.partitionBy("qid").orderBy(
        F.asc("approx_d2"), F.asc("vid")
    )
    cands = (
        pq_adc_score_pairs(pairs, cb, qids, qmat)
        .withColumn("crk", F.row_number().over(cand_w))
        .filter(F.col("crk") <= _PQ_RERANK)
    )
    return pq_exact_rerank(cands.select("qid", "vid"), unit, qids, qmat)


# --------------------------------------------------------------------------
# ann_sq8  (int8 scalar quantization: the 4x storage tier below float32)
# --------------------------------------------------------------------------


@register("ann_sq8")  # rows-only: float quantization/rounding; recall vs
# the exact baseline is asserted in tests/test_similarity.py
def ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8-quantized ANN — the faiss SQ8 / Lucene int8-HNSW
    storage tier, and the quantization production vector stores reach
    for BEFORE product quantization (4x memory cut, ~1e-3 dot error,
    no training step at all): each unit vector stores as 64 int8 codes
    plus ONE per-vector scale (max|x| / 127).  Search is ASYMMETRIC
    (Guo et al.'s ADC convention, like the PQ family): the float query
    scores against the int8 codes — approx_ip = scale * (codes . q) —
    and the top-_PQ_RERANK candidates re-rank exactly through the
    shared pq_exact_rerank recall knob.

    100 TB shape: the scan moves 64 bytes of codes + 8 of scale per
    vector instead of 512 of float64 (and needs no codebooks to
    broadcast); raw embeddings are touched only for the re-rank
    candidates.  Quantize is one Arrow pass; scoring is one numpy
    matmul per batch; the only shuffle is the per-query top-k window —
    identical plan skeleton to ann_pq with the codebook machinery
    deleted, which is exactly SQ8's selling point."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    tune(spark)
    unit = pq_unit_vectors(t(spark, sf_dir, "embeddings"))
    qids, qmat = pq_query_vectors(unit)

    def quantize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.array(list(pdf["u"]), dtype=np.float64)
            scale = np.abs(x).max(axis=1) / 127.0
            scale[scale == 0.0] = 1.0  # zero vector -> zero codes
            codes = np.rint(x / scale[:, None]).astype(np.int8)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "scale": scale,
                    "codes": list(codes),
                }
            )

    coded = unit.mapInPandas(
        quantize, "vec_id long, scale double, codes array<tinyint>"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codes = np.array(list(pdf["codes"]), dtype=np.float64)
            approx = pdf["scale"].values[:, None] * (codes @ qmat.T)
            n, nq = approx.shape
            yield pd.DataFrame(
                {
                    "qid": np.tile(qids, n),
                    "vid": np.repeat(pdf["vec_id"].values, nq),
                    "approx_ip": approx.ravel(),
                }
            )

    cand_w = Window.partitionBy("qid").orderBy(
        F.desc("approx_ip"), F.asc("vid")
    )
    cands = (
        coded.mapInPandas(score, "qid long, vid long, approx_ip double")
        .filter(F.col("qid") != F.col("vid"))
        .withColumn("crk", F.row_number().over(cand_w))
        .filter(F.col("crk") <= _PQ_RERANK)
    )
    return pq_exact_rerank(cands.select("qid", "vid"), unit, qids, qmat)


# --------------------------------------------------------------------------
# matryoshka_truncate_recall  (MRL prefix-truncation quality eval)
# --------------------------------------------------------------------------

# Matryoshka-style embeddings are served TRUNCATED (the first d' dims,
# re-normalized) to cut index cost; the deployment question is how much
# retrieval quality the truncation loses.  This op answers it exactly:
# for each probe query, the top-5 neighbor sets under full-dim and
# prefix-truncated cosine, their overlap, and the truncated top-1 —
# all cosines via the module's exact-decimal dot product, so the whole
# eval (both rankings AND the overlap count) is hash-certified.
_MRL_DIM = 16    # prefix dims kept (of 64)
_MRL_K = 5
_MRL_NQ = 10     # probe queries: vec_id < 10 (similarity_topk's set)


def _dot_prefix(a: str, b: str, d: int) -> F.Column:
    return F.expr(
        _DOT_EXPR.format(a=f"slice({a}, 1, {d})", b=f"slice({b}, 1, {d})")
    )


_MRL_ORACLE = f"""
WITH nf AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i
        FROM embeddings)
  GROUP BY vec_id
),
nt AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_MRL_DIM + 1})) AS i
        FROM embeddings)
  GROUP BY vec_id
),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < {_MRL_NQ}),
df AS (
  SELECT qid, vec_id AS vid, {_DOT_SQL('qe', 'embedding')} AS dot
  FROM (SELECT q.qid, q.qe, e.vec_id, e.embedding,
               unnest(range(1, {_DIM + 1})) AS i
        FROM q, embeddings e WHERE e.vec_id <> q.qid)
  GROUP BY qid, vec_id
),
dt AS (
  SELECT qid, vec_id AS vid, {_DOT_SQL('qe', 'embedding')} AS dot
  FROM (SELECT q.qid, q.qe, e.vec_id, e.embedding,
               unnest(range(1, {_MRL_DIM + 1})) AS i
        FROM q, embeddings e WHERE e.vec_id <> q.qid)
  GROUP BY qid, vec_id
),
ranked AS (
  SELECT df.qid, df.vid,
         ROW_NUMBER() OVER (PARTITION BY df.qid
             ORDER BY df.dot / sqrt(nqf.n2 * nvf.n2) DESC, df.vid)
           AS rank_full,
         ROW_NUMBER() OVER (PARTITION BY df.qid
             ORDER BY dt.dot / sqrt(nqt.n2 * nvt.n2) DESC, df.vid)
           AS rank_trunc
  FROM df
  JOIN dt ON dt.qid = df.qid AND dt.vid = df.vid
  JOIN nf nqf ON nqf.vec_id = df.qid
  JOIN nf nvf ON nvf.vec_id = df.vid
  JOIN nt nqt ON nqt.vec_id = df.qid
  JOIN nt nvt ON nvt.vec_id = df.vid
)
SELECT qid,
       CAST(SUM(CASE WHEN rank_full <= {_MRL_K} AND rank_trunc <= {_MRL_K}
                THEN 1 ELSE 0 END) AS BIGINT) AS overlap_at_5,
       MAX(CASE WHEN rank_trunc = 1 THEN vid END) AS trunc_top1,
       MAX(CASE WHEN rank_full = 1 THEN vid END) AS full_top1
FROM ranked
GROUP BY qid
"""


@register("matryoshka_truncate_recall", _MRL_ORACLE)
def matryoshka_truncate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe query: how many of the exact top-5 survive when the
    embedding is truncated to its first 16 of 64 dims (the Matryoshka
    serving trade-off), plus both top-1 ids.  Full- and truncated-dim
    exact cosines ride ONE pair pass (the truncated dot is a prefix
    slice of the same arrays), ranks are two windows over the
    query-bounded pair set, output is |queries| rows.

    At 100 TB the pair pass is the similarity_topk baseline shape —
    the production path truncates INSIDE the stored index (ann_ivf /
    ann_pq over sliced vectors, same plan); this op is the quality
    gate that says whether the truncation is safe to serve."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    nf = emb.select(
        "vec_id", _dot("embedding", "embedding").alias("n2f")
    )
    nt = emb.select(
        "vec_id",
        _dot_prefix("embedding", "embedding", _MRL_DIM).alias("n2t"),
    )
    q = emb.filter(F.col("vec_id") < _MRL_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("vid"),
            _dot("qe", "embedding").alias("dot_f"),
            _dot_prefix("qe", "embedding", _MRL_DIM).alias("dot_t"),
        )
    )
    scored = (
        pairs.join(nf.withColumnRenamed("vec_id", "qid"), "qid")
        .withColumnRenamed("n2f", "nq_f")
        .join(nt.withColumnRenamed("vec_id", "qid"), "qid")
        .withColumnRenamed("n2t", "nq_t")
        .join(nf.withColumnRenamed("vec_id", "vid"), "vid")
        .withColumnRenamed("n2f", "nv_f")
        .join(nt.withColumnRenamed("vec_id", "vid"), "vid")
        .withColumnRenamed("n2t", "nv_t")
    )
    wf = Window.partitionBy("qid").orderBy(
        (F.col("dot_f") / F.sqrt(F.col("nq_f") * F.col("nv_f"))).desc(),
        F.col("vid"),
    )
    wt = Window.partitionBy("qid").orderBy(
        (F.col("dot_t") / F.sqrt(F.col("nq_t") * F.col("nv_t"))).desc(),
        F.col("vid"),
    )
    ranked = scored.select(
        "qid",
        "vid",
        F.row_number().over(wf).alias("rank_full"),
        F.row_number().over(wt).alias("rank_trunc"),
    )
    return ranked.groupBy("qid").agg(
        F.sum(
            F.when(
                (F.col("rank_full") <= _MRL_K)
                & (F.col("rank_trunc") <= _MRL_K),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("overlap_at_5"),
        F.max(F.when(F.col("rank_trunc") == 1, F.col("vid"))).alias(
            "trunc_top1"
        ),
        F.max(F.when(F.col("rank_full") == 1, F.col("vid"))).alias(
            "full_top1"
        ),
    )


# --------------------------------------------------------------------------
# ann_binary_hamming  (ES BBQ-style 1-bit quantization + exact rerank)
# --------------------------------------------------------------------------

# The binary-quantization storage tier (ES 8.16 BBQ / faiss binary
# indexes): center each dimension on the DATASET centroid, keep only
# the sign -> 64 dims become 64 bits (32x smaller than float32), and
# candidate generation is a popcount-Hamming scan over the codes with
# an exact-cosine re-rank of the oversampled top.  Unlike the PQ/SQ8
# tiers (trained float codebooks -> rows-only), every step here is
# exact integer/decimal arithmetic, so the WHOLE probe — centroid,
# codes, Hamming ranking, re-rank — is hash-certified cross-engine.
# The centroid rides the same exact-decimal trick as the LSH
# projections (order-independent sums; DECIMAL(30,12) holds the 100x
# replica's ~250k-magnitude sums with 18 digits of headroom).
_BH_RERANK = 20  # Hamming oversample depth fed to the exact re-rank
_BH_TOPK = 5


def _bh_codes_sql() -> str:
    """codes CTE body: per vector, two 32-bit halves of the centered
    sign code (two halves keep the bit sums far from BIGINT range)."""
    return f"""
  SELECT vec_id,
    CAST(SUM(CASE WHEN i <= 32 AND v >= c THEN CAST(pow(2, i - 1) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS code_lo,
    CAST(SUM(CASE WHEN i > 32 AND v >= c THEN CAST(pow(2, i - 33) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS code_hi
  FROM (
    SELECT e.vec_id, e.i, e.v, ctr.c
    FROM (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
          FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i
                FROM embeddings)) e
    JOIN (SELECT i,
                 CAST(SUM(CAST(v AS DECIMAL(30,12))) AS DOUBLE)
                   / COUNT(*) AS c
          FROM (SELECT i, CAST(embedding[i] AS DOUBLE) AS v
                FROM (SELECT embedding, unnest(range(1, {_DIM + 1})) AS i
                      FROM embeddings))
          GROUP BY i) ctr ON ctr.i = e.i
  )
  GROUP BY vec_id"""


_BINARY_HAMMING_ORACLE = f"""
WITH codes AS ({_bh_codes_sql()}
), q AS (
  SELECT vec_id AS qid, code_lo AS qlo, code_hi AS qhi
  FROM codes WHERE vec_id < 10
), ham AS (
  SELECT q.qid, c.vec_id AS vid,
         CAST(bit_count(xor(q.qlo, c.code_lo))
              + bit_count(xor(q.qhi, c.code_hi)) AS INTEGER) AS hamming
  FROM q JOIN codes c ON c.vec_id <> q.qid
), shortlist AS (
  SELECT qid, vid, hamming FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY hamming, vid) AS hrk
    FROM ham
  ) WHERE hrk <= {_BH_RERANK}
), norms AS (
  SELECT vec_id, {_DOT_SQL('embedding', 'embedding')} AS n2
  FROM (SELECT vec_id, embedding, unnest(range(1, {_DIM + 1})) AS i
        FROM embeddings)
  GROUP BY vec_id
), rescored AS (
  SELECT s.qid, s.vid, s.hamming, d.dot / sqrt(nq.n2 * nv.n2) AS cosine
  FROM shortlist s
  JOIN (
    SELECT qid, vec_id AS vid, {_DOT_SQL('qe', 'embedding')} AS dot
    FROM (
      SELECT s2.qid, eq.embedding AS qe, ev.vec_id, ev.embedding,
             unnest(range(1, {_DIM + 1})) AS i
      FROM shortlist s2
      JOIN embeddings eq ON eq.vec_id = s2.qid
      JOIN embeddings ev ON ev.vec_id = s2.vid
    )
    GROUP BY qid, vec_id
  ) d ON d.qid = s.qid AND d.vid = s.vid
  JOIN norms nq ON nq.vec_id = s.qid
  JOIN norms nv ON nv.vec_id = s.vid
)
SELECT qid, vid, hamming, cosine, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vid) AS rk
  FROM rescored
)
WHERE rk <= {_BH_TOPK}
"""


@register("ann_binary_hamming", _BINARY_HAMMING_ORACLE)
def ann_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (the ES BBQ storage tier): center on the
    dataset's per-dimension centroid (exact-decimal mean — order-
    independent), binarize to two 32-bit sign words, rank candidates
    by popcount Hamming over the codes, then exact-cosine re-rank the
    Hamming top-{r} into the final top-{k}.  Every stage is exact, so
    the full probe is hash-certified — the certification the trained
    PQ/SQ8 tiers cannot have.

    Scale shape: codes are 8 bytes/vector (the 32x cut that lets a
    100 TB corpus's candidate scan live in memory); the centroid is a
    {d}-value broadcast; Hamming ranking shuffles (qid, vid, int) and
    only the {r}-deep shortlist pays float re-rank — the
    oversample+rescore contract of ES's own BBQ search."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    elems = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "v")
    ).select(
        "vec_id", (F.col("i0") + 1).alias("i"), F.col("v").cast("double").alias("v")
    )
    centroid = elems.groupBy("i").agg(
        (
            F.sum(F.col("v").cast("decimal(30,12)")).cast("double")
            / F.count("*")
        ).alias("c")
    )
    codes = (
        elems.join(F.broadcast(centroid), "i")
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("i") <= 32) & (F.col("v") >= F.col("c")),
                    F.expr("shiftleft(CAST(1 AS BIGINT), i - 1)"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("code_lo"),
            F.sum(
                F.when(
                    (F.col("i") > 32) & (F.col("v") >= F.col("c")),
                    F.expr("shiftleft(CAST(1 AS BIGINT), i - 33)"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("code_hi"),
        )
    )
    codes = checkpoint_slot("bbq_codes", codes)
    q = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("code_lo").alias("qlo"),
        F.col("code_hi").alias("qhi"),
    )
    ham = q.join(codes, F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("vid"),
        (
            F.bit_count(F.expr("qlo ^ code_lo"))
            + F.bit_count(F.expr("qhi ^ code_hi"))
        )
        .cast("int")
        .alias("hamming"),
    )
    wh = Window.partitionBy("qid").orderBy("hamming", "vid")
    shortlist = (
        ham.withColumn("hrk", F.row_number().over(wh))
        .filter(F.col("hrk") <= _BH_RERANK)
        .drop("hrk")
    )
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    qe = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    ve = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve"))
    rescored = (
        shortlist.join(F.broadcast(qe), "qid")
        .join(ve, "vid")
        .select("qid", "vid", "hamming", _dot("qe", "ve").alias("dot"))
        .join(
            norms.select(F.col("vec_id").alias("qid"), F.col("n2").alias("nq")),
            "qid",
        )
        .join(
            norms.select(F.col("vec_id").alias("vid"), F.col("n2").alias("nv")),
            "vid",
        )
        .select(
            "qid",
            "vid",
            "hamming",
            (F.col("dot") / F.sqrt(F.col("nq") * F.col("nv"))).alias("cosine"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        rescored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _BH_TOPK)
        .select("qid", "vid", "hamming", "cosine", "rk")
    )
