"""Hard correctness evidence for the rows-only PCA operator: the
distributed two-pass Gram/project pipeline must agree with a
single-node numpy PCA on the same rows, to float64 tolerance."""

from __future__ import annotations

import numpy as np

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.pca import (
    _PCA_K,
    embedding_pca_project,
    fit_pca,
)


def _numpy_reference(spark, sf_dir):
    rows = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:_PCA_K]
    w = evecs[:, order]
    for j in range(w.shape[1]):
        i = int(np.abs(w[:, j]).argmax())
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    return ids, (x - mu) @ w, mu, w


def test_fit_matches_numpy(spark, sf_dir):
    mu, w, evr = fit_pca(t(spark, sf_dir, "embeddings"))
    _, _, mu_ref, w_ref = _numpy_reference(spark, sf_dir)
    assert np.allclose(mu, mu_ref, rtol=1e-9, atol=1e-12)
    assert np.allclose(w, w_ref, rtol=1e-7, atol=1e-9)
    # explained variance ratios are sorted and in (0, 1]
    assert all(evr[i] >= evr[i + 1] for i in range(len(evr) - 1))
    assert 0 < evr.sum() <= 1 + 1e-12


def test_projection_matches_numpy_row_for_row(spark, sf_dir):
    out = {
        r["vec_id"]: np.asarray(r["proj"])
        for r in embedding_pca_project(spark, sf_dir).collect()
    }
    ids, z_ref, _, _ = _numpy_reference(spark, sf_dir)
    assert len(out) == len(ids)
    for i, vid in enumerate(ids):
        assert np.allclose(out[vid], z_ref[i], rtol=1e-7, atol=1e-9), vid


def test_projection_variance_is_ordered(spark, sf_dir):
    proj = np.array(
        [r["proj"] for r in embedding_pca_project(spark, sf_dir).collect()]
    )
    variances = proj.var(axis=0, ddof=1)
    assert all(
        variances[i] >= variances[i + 1] - 1e-12
        for i in range(len(variances) - 1)
    )
    # centered output: each component's mean is ~0
    assert np.allclose(proj.mean(axis=0), 0, atol=1e-9)
