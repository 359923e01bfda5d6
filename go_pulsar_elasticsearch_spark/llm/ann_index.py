"""Persisted ANN index artifacts (round-5 VERDICT #2): the 100 TB shape
is TRAIN-ONCE / PROBE-MANY — a stored index on cheap storage, loaded by
every probe job — not a quantizer refit inside every query.

Two index families, both written as plain parquet (the format every
engine on the lake can read):

- IVF  (`ann_ivf_stored`, HASH-certified against the SAME closed-form
  oracle as the in-memory `ann_ivf`): artifacts are the coarse
  centroids (cid, ce), the per-vector list assignment (vec_id, cid)
  and the vector norms (vec_id, n2).  Probing loads the KB-sized
  centroids to rank probe lists per query, joins the assignment table
  on the list id, and exact-cosine re-ranks — identical math, so the
  oracle certifies the artifact round-trip end-to-end.
- PQ   (`ann_pq_stored`, rows-only like its in-memory twin `ann_pq`
  because the codebooks are trained floats): artifacts are the
  codebooks (sub, cid, centroid) and the coded vectors (vec_id,
  codes).  Training is DETERMINISTIC (fixed Lloyd init, no RNG), so a
  reloaded index reproduces the fresh fit bit-for-bit — asserted in
  tests/test_ann_index.py, which also proves probe-many reuse (second
  probe never retrains).

Scale posture: the index build is the only heavy pass (one scan +
bounded training state); probes move codes/assignments, never the raw
embedding matrix, and every driver-side collect here is index-metadata
sized (centroids, codebooks) — KBs at any corpus size.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
# NOTE: the quantizer knobs (_IVF_STEP, _NPROBE, _PQ_*) are deliberately
# NOT from-imported — an import-time copy would go stale if the knob is
# reconfigured, while index_dir re-keys on the live value; every use
# reads the similarity module at call time (_sim.<knob>)
from go_pulsar_elasticsearch_spark.llm import similarity as _sim
from go_pulsar_elasticsearch_spark.llm.similarity import (
    _dot,
    _IVF_ORACLE,
    pq_codebook_array,
    pq_encode_df,
    pq_query_vectors,
    pq_search,
    pq_train_codebooks_df,
    pq_unit_vectors,
)
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune


def _hyperparams(kind: str) -> str:
    """The knobs baked into each family's artifact key — changing any
    of them must address a DIFFERENT artifact, never reuse a stale one.
    Read off the similarity module at CALL time (not import-time copies)
    so a reconfigured quantizer re-keys immediately."""
    if kind.startswith("ivf"):
        return f"step={_sim._IVF_STEP}"
    return f"m={_sim._PQ_M},k={_sim._PQ_K},iters={_sim._PQ_ITERS}"


def index_dir(kind: str, sf_dir: str) -> str:
    """Artifact root for (index kind, corpus): content-addressed by the
    corpus path + index hyperparameters so two corpora never share and
    a hyperparameter change never reuses a stale artifact."""
    key = hashlib.sha256(
        f"{kind}|{os.path.abspath(sf_dir)}|{_hyperparams(kind)}".encode()
    ).hexdigest()[:16]
    return os.path.join(
        tempfile.gettempdir(), "gpe_ann", f"{kind}-{key}"
    )


def _publish_marker(d: str) -> str:
    return os.path.join(d, "_INDEX_READY")


def _is_built(d: str) -> bool:
    return os.path.exists(_publish_marker(d))


def _mark_built(d: str) -> None:
    with open(_publish_marker(d), "w") as fh:
        fh.write("ok\n")


def _publish_dir(scratch: str, out_dir: str) -> None:
    """Atomically publish a fully-built scratch tree (marker already
    inside) as ``out_dir`` with one os.rename — the same pattern as
    ivf_append_index's deltas, applied to the BASE build: two processes
    racing past _is_built() can no longer interleave overwrites inside
    the final dir; the rename loser drops its scratch (deterministic
    build -> identical artifacts)."""
    import shutil

    try:
        os.rename(scratch, out_dir)
    except OSError:
        if _is_built(out_dir):
            # race lost: a sibling published first and theirs == ours
            shutil.rmtree(scratch, ignore_errors=True)
            return
        # a stale half-build (pre-atomic era or killed mid-write, no
        # marker) occupies the name: clear it and retry once
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.rename(scratch, out_dir)
        except OSError:
            shutil.rmtree(scratch, ignore_errors=True)


# --------------------------------------------------------------------------
# IVF
# --------------------------------------------------------------------------


def _ivf_assign(emb: DataFrame, cents: DataFrame, norms: DataFrame) -> DataFrame:
    """Nearest-centroid assignment for ``emb`` against ``cents``: one
    broadcast cross + per-vector window (bounded: K rows per vector)."""
    from pyspark.sql import Window

    adots = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", _dot("embedding", "ce").alias("dot")
    )
    cnorms = cents.select(
        "cid", _dot("ce", "ce").alias("nc")
    )
    ranked = (
        adots.join(
            norms.select(F.col("vec_id"), F.col("n2").alias("nv")), "vec_id"
        )
        .join(F.broadcast(cnorms), "cid")
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
    return ranked.filter(F.col("crk") == 1).select("vec_id", "cid")


def ivf_build_index(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    where: F.Column | None = None,
) -> None:
    """One corpus pass -> three parquet artifacts: centroids (every
    _IVF_STEP-th vector, the deterministic coarse quantizer), the
    nearest-centroid assignment per vector, and the vector norms.
    ``where`` restricts the BASE corpus (the append path adds the rest
    later).  Built into a dot-prefixed scratch sibling and published
    with one atomic os.rename (marker written inside the scratch tree
    first) — a killed or racing build can never leave the final dir
    marker-over-corrupt."""
    emb = t(spark, sf_dir, "embeddings")
    if where is not None:
        emb = emb.filter(where)
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    cents = emb.filter(F.col("vec_id") % _sim._IVF_STEP == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    assign = _ivf_assign(emb, cents, norms)
    parent, base = os.path.split(os.path.abspath(out_dir))
    scratch = os.path.join(parent, f".tmp-{base}-{os.getpid()}")
    os.makedirs(scratch, exist_ok=True)
    cents.write.mode("overwrite").parquet(os.path.join(scratch, "centroids"))
    assign.write.mode("overwrite").parquet(os.path.join(scratch, "assign"))
    norms.write.mode("overwrite").parquet(os.path.join(scratch, "norms"))
    _mark_built(scratch)
    _publish_dir(scratch, out_dir)


def ivf_append_index(
    spark: SparkSession,
    sf_dir: str,
    idx_dir: str,
    where: F.Column,
    tag: str,
) -> None:
    """APPEND-ONLY index maintenance (the daily-ingest path at 100 TB:
    new vectors join the index WITHOUT retraining): assign the ``where``
    slice against the STORED centroids and publish it as a DELTA
    partition (`assign_delta_<tag>`, `norms_delta_<tag>`) next to the
    base artifacts.  Crash-safe, idempotent AND concurrency-safe: each
    delta table is written to a dot-prefixed scratch dir (invisible to
    _with_deltas' glob) and published with one atomic os.rename — a
    published delta is never deleted or rewritten in place, so a probe
    can't catch a half-state even with a concurrent appender (the
    loser of the rename race drops its scratch: deterministic
    assignment against frozen centroids makes both copies identical).
    The per-tag marker — written only after BOTH tables land — is what
    makes the delta visible to probes."""
    import shutil

    marker = os.path.join(idx_dir, f"_APPENDED_{tag}")
    if os.path.exists(marker):
        return
    emb = t(spark, sf_dir, "embeddings").filter(where)
    cents = spark.read.parquet(os.path.join(idx_dir, "centroids"))
    norms = emb.select("vec_id", _dot("embedding", "embedding").alias("n2"))
    assign = _ivf_assign(emb, cents, norms)
    for name, df in (("assign", assign), ("norms", norms)):
        final = os.path.join(idx_dir, f"{name}_delta_{tag}")
        if os.path.isdir(final):
            continue  # published by a sibling/crashed run (rename=atomic)
        tmp = os.path.join(idx_dir, f".tmp-{name}_delta_{tag}-{os.getpid()}")
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, final)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # race lost; theirs == ours
    with open(marker, "w") as fh:
        fh.write("ok\n")


def _with_deltas(spark: SparkSession, idx_dir: str, table: str) -> DataFrame:
    """The base artifact UNIONed with every PUBLISHED delta (marker
    present; an unmarked delta is a half-written append awaiting its
    idempotent rewrite and must stay invisible)."""
    import glob as _glob

    paths = [os.path.join(idx_dir, table)]
    for d in sorted(_glob.glob(os.path.join(idx_dir, f"{table}_delta_*"))):
        tag = os.path.basename(d)[len(table) + len("_delta_"):]
        if os.path.exists(os.path.join(idx_dir, f"_APPENDED_{tag}")):
            paths.append(d)
    return spark.read.parquet(*paths)


def ivf_probe(
    spark: SparkSession, sf_dir: str, idx_dir: str, topk: int = 3
) -> DataFrame:
    """Probe the STORED index: rank each query's _NPROBE nearest lists
    against the loaded centroids (KB-sized broadcast), pull candidates
    from the stored assignment table (base + published deltas),
    exact-cosine re-rank.  Identical math to ann_ivf — deliberately a
    separate implementation rather than a shared helper: the in-memory
    op ranks ALL vectors in one window pass (assignment and probes fall
    out of the same frame), while the stored path ranks only the query
    set against frozen artifacts; sharing would contort one shape into
    the other, and the shared closed-form ORACLE is the equivalence
    gate — any divergence fails certification loudly."""
    from pyspark.sql import Window

    emb = t(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(os.path.join(idx_dir, "centroids"))
    assign = _with_deltas(spark, idx_dir, "assign")
    norms = _with_deltas(spark, idx_dir, "norms")
    queries = emb.filter(F.col("vec_id") < 10)
    qdots = queries.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", _dot("embedding", "ce").alias("dot")
    )
    # centroid norms come from the KB-sized centroid table itself (a
    # centroid IS its vector), never a corpus-sized norms broadcast
    cnorms = cents.select("cid", _dot("ce", "ce").alias("nc"))
    probes = (
        qdots.join(
            norms.select(F.col("vec_id"), F.col("n2").alias("nv")), "vec_id"
        )
        .join(F.broadcast(cnorms), "cid")
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc(F.col("dot") / F.sqrt(F.col("nv") * F.col("nc"))),
                    F.asc("cid"),
                )
            ),
        )
        .filter(F.col("crk") <= _sim._NPROBE)
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
        .select(
            "qid",
            "vid",
            (F.col("dot") / F.sqrt(F.col("nq") * F.col("nv"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("qid", "vid", "cosine", "rk")
    )


@register("ann_ivf_stored", _IVF_ORACLE)
def ann_ivf_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe against the PERSISTED index (train-once/probe-many):
    builds the parquet artifacts on first touch, every later invocation
    (and every later process) loads them.  Hash-certified by the SAME
    closed-form oracle as the in-memory ann_ivf — the artifact
    round-trip provably changes nothing."""
    tune(spark)
    d = index_dir("ivf", sf_dir)
    if not _is_built(d):
        ivf_build_index(spark, sf_dir, d)
    return ivf_probe(spark, sf_dir, d)


@register("ann_ivf_append", _IVF_ORACLE)
def ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance, hash-certified: build the stored
    IVF index on the BASE corpus (vec_id % 4 != 3, ~75%), then APPEND
    the remaining quarter against the stored centroids — no retrain —
    and probe the merged artifacts.

    Certified by the SAME closed-form oracle as the full-corpus
    ann_ivf: every centroid id is a multiple of _IVF_STEP (even), and
    even numbers are never ≡ 3 (mod 4), so the base slice contains the
    ENTIRE centroid set and base-build + delta-append must reproduce
    the full build bit-for-bit — which is exactly the invariant an
    append path has to prove (new data lands in the right lists
    without disturbing old ones)."""
    assert _sim._IVF_STEP % 2 == 0, \
        "centroid-parity invariant needs an even step"
    tune(spark)
    d = index_dir("ivf_base", sf_dir)
    if not _is_built(d):
        ivf_build_index(
            spark, sf_dir, d, where=F.col("vec_id") % 4 != F.lit(3)
        )
    ivf_append_index(
        spark, sf_dir, d, where=F.col("vec_id") % 4 == F.lit(3), tag="q4"
    )
    return ivf_probe(spark, sf_dir, d)


# --------------------------------------------------------------------------
# PQ
# --------------------------------------------------------------------------


def pq_build_index(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    where: F.Column | None = None,
) -> None:
    """Two parquet artifacts: codebooks (sub, cid, centroid) and the
    PQ-coded corpus (vec_id, codes) — 8 small ints per vector instead
    of 64 doubles, the whole point of PQ at 100 TB.  ``where``
    restricts the BASE corpus (codebooks train on it; the append path
    encodes the rest later against those frozen codebooks).  Same
    atomic scratch+rename publish as ivf_build_index."""
    emb = t(spark, sf_dir, "embeddings")
    if where is not None:
        emb = emb.filter(where)
    unit = pq_unit_vectors(emb)
    cb_df = pq_train_codebooks_df(unit)
    parent, base = os.path.split(os.path.abspath(out_dir))
    scratch = os.path.join(parent, f".tmp-{base}-{os.getpid()}")
    os.makedirs(scratch, exist_ok=True)
    cb_df.write.mode("overwrite").parquet(os.path.join(scratch, "codebooks"))
    cb = pq_codebook_array(
        spark.read.parquet(os.path.join(scratch, "codebooks")).collect()
    )
    pq_encode_df(unit, cb).write.mode("overwrite").parquet(
        os.path.join(scratch, "codes")
    )
    _mark_built(scratch)
    _publish_dir(scratch, out_dir)


@register("ann_pq_stored")  # rows-only: float codebooks, like ann_pq;
# artifact-equals-fresh-fit asserted in tests/test_ann_index.py
def ann_pq_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC search against the PERSISTED codebooks + coded corpus:
    search scans 8-code rows from parquet (never re-encoding), re-ranks
    exactly against raw vectors.  Deterministic training makes the
    stored probe bit-identical to the in-memory ann_pq."""
    tune(spark)
    d = index_dir("pq", sf_dir)
    if not _is_built(d):
        pq_build_index(spark, sf_dir, d)
    cb = pq_codebook_array(
        spark.read.parquet(os.path.join(d, "codebooks")).collect()
    )
    coded = spark.read.parquet(os.path.join(d, "codes"))
    unit = pq_unit_vectors(t(spark, sf_dir, "embeddings"))
    qids, qmat = pq_query_vectors(unit)
    return pq_search(coded, unit, cb, qids, qmat)


def pq_append_index(
    spark: SparkSession,
    sf_dir: str,
    idx_dir: str,
    where: F.Column,
    tag: str,
) -> None:
    """APPEND-ONLY PQ maintenance (round-6 VERDICT #4, the exact
    pattern of ivf_append_index): encode the ``where`` slice against
    the STORED codebooks — no retrain, the quantizer is frozen — and
    publish it as a marked delta partition (`codes_delta_<tag>`).
    Crash-safe, idempotent and concurrency-safe via the dot-prefixed
    scratch + atomic rename + marker-last protocol; deterministic
    encoding against frozen codebooks makes a rename-race loser's copy
    identical to the winner's."""
    import shutil

    marker = os.path.join(idx_dir, f"_APPENDED_{tag}")
    if os.path.exists(marker):
        return
    cb = pq_codebook_array(
        spark.read.parquet(os.path.join(idx_dir, "codebooks")).collect()
    )
    unit = pq_unit_vectors(t(spark, sf_dir, "embeddings").filter(where))
    final = os.path.join(idx_dir, f"codes_delta_{tag}")
    if not os.path.isdir(final):
        tmp = os.path.join(idx_dir, f".tmp-codes_delta_{tag}-{os.getpid()}")
        pq_encode_df(unit, cb).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, final)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # race lost; theirs == ours
    with open(marker, "w") as fh:
        fh.write("ok\n")


@register("ann_pq_append")  # rows-only: float codebooks, like ann_pq;
# append==one-shot-encode equality asserted in tests/test_ann_index.py
def ann_pq_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PQ maintenance: train codebooks on the BASE corpus
    (vec_id % 4 != 3, ~75%), APPEND the remaining quarter as codes
    encoded against those frozen codebooks, probe the merged artifacts.
    A growing corpus joins the index without a codebook retrain —
    tests pin that base-build + delta-append reproduces one-shot
    encoding of the full corpus against the same codebooks bit-for-bit,
    and that probes union only MARKED deltas."""
    tune(spark)
    d = index_dir("pq_base", sf_dir)
    if not _is_built(d):
        pq_build_index(
            spark, sf_dir, d, where=F.col("vec_id") % 4 != F.lit(3)
        )
    pq_append_index(
        spark, sf_dir, d, where=F.col("vec_id") % 4 == F.lit(3), tag="q4"
    )
    cb = pq_codebook_array(
        spark.read.parquet(os.path.join(d, "codebooks")).collect()
    )
    coded = _with_deltas(spark, d, "codes")
    unit = pq_unit_vectors(t(spark, sf_dir, "embeddings"))
    qids, qmat = pq_query_vectors(unit)
    return pq_search(coded, unit, cb, qids, qmat)
