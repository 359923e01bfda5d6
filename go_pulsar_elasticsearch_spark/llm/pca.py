"""PCA projection of the embedding table — the dimensionality-reduction
pass a similarity/clustering pipeline runs before IVF/PQ indexing when
the raw dimension is wasteful (OPQ-style rotations, whitening, and
2-D corpus maps all start here).

Spark-first decomposition of the classic two-pass algorithm:

  pass 1  per-partition Gram accumulation: each Arrow batch folds into
          a running (n, sum, X'X) triple in numpy; ONE row per
          partition comes back (d=64 -> ~33 KB/row), so the collect is
          |partitions|-bounded, never data-sized.  This is the textbook
          tree-aggregation shape (pyspark.ml.feature.PCA does the same
          via RowMatrix.computeGramianMatrix — reimplemented here to
          keep the Arrow path and the covariance math visible).
  driver  assemble covariance C = (G - N mu mu')/(N-1) — a d x d
          problem, solved with numpy.linalg.eigh in microseconds; model
          size is d*k doubles, broadcast back.
  pass 2  stateless projection z = W'(x - mu) per row via one more
          mapInPandas matmul — embeddings never shuffle at all.

Registered rows-only: an eigendecomposition is not expressible in
ANSI SQL (the driver records row-count only), so the hard correctness
evidence is tests/test_pca.py — bit-level agreement with a single-node
numpy PCA on the same rows (same sign convention), plus the variance
ordering var(pc1) >= var(pc2) >= ... that defines PCA.

100 TB posture: pass 1 is a full scan with d^2 floats of state per
task and one 33 KB emit; the driver solve is data-size-independent;
pass 2 is a narrow map.  No shuffle anywhere.  Skew-irrelevant (no
keys).  The only growth axis is d — at d=4096 the Gram row is 128 MB
and pass 1 should switch to pyspark.ml's treeAggregate depth-2 form;
the fixture d=64 is far below that.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_DIM = 64
_PCA_K = 8


def fit_pca(emb: DataFrame, dim: int = _DIM, k: int = _PCA_K):
    """Fit PCA on an embedding DataFrame; returns (mu, W, evr) as numpy
    arrays — mean (d,), components (d, k) with the deterministic sign
    convention (each column's max-|.|-coordinate is positive), and the
    explained-variance ratio (k,)."""
    import numpy as np

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    partials = (
        emb.select("embedding")
        .mapInPandas(gram, "n long, s array<double>, g array<double>")
        .collect()
    )
    n_total = sum(r["n"] for r in partials)
    s_total = np.sum([np.asarray(r["s"]) for r in partials], axis=0)
    g_total = np.sum(
        [np.asarray(r["g"]).reshape(dim, dim) for r in partials], axis=0
    )
    mu = s_total / n_total
    cov = (g_total - n_total * np.outer(mu, mu)) / (n_total - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    w = evecs[:, order]
    # deterministic sign: flip each component so its largest-|.| entry
    # is positive (ties impossible at float64 on real data)
    for j in range(w.shape[1]):
        i = int(np.abs(w[:, j]).argmax())
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    evr = evals[order] / evals.sum()
    return mu, w, evr


@register("embedding_pca_project")  # rows-only: eigendecomposition
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto its corpus's top-8 principal
    components (two passes, zero shuffles; see module docstring)."""
    tune(spark)
    emb = t(spark, sf_dir, "embeddings")
    mu, w, _ = fit_pca(emb)
    mu_l, w_l = mu.tolist(), w.tolist()

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        m = np.asarray(mu_l)
        ww = np.asarray(w_l)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            z = (x - m) @ ww
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "label": pdf["label"].astype("int32"),
                    "proj": [row.tolist() for row in z],
                }
            )

    return emb.select("vec_id", "label", "embedding").mapInPandas(
        project, "vec_id long, label int, proj array<double>"
    ).withColumn("pc1", F.col("proj")[0])
