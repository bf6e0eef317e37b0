"""PCA embedding compression (plans/pca.py): exact distributed fit,
Arrow-batched projection, reduced-space shortlist + exact re-rank.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.plans import pca as P

D = 8
N = 300


def _corpus(seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic data: variance concentrated in a few directions
    basis = np.linalg.qr(rng.normal(size=(D, D)))[0]
    scales = np.array([8, 5, 3, 1, 0.5, 0.2, 0.1, 0.05])
    return rng.normal(size=(N, D)) * scales @ basis.T + rng.normal(size=D)


@pytest.fixture(scope="module")
def data():
    return _corpus()


@pytest.fixture(scope="module")
def df(spark, data):
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    ).repartition(8)


def _numpy_pca(x, k, center=True):
    mean = x.mean(axis=0) if center else np.zeros(x.shape[1])
    xc = x - mean
    cov = xc.T @ xc / (len(x) - 1)
    vals, vecs = np.linalg.eigh((cov + cov.T) / 2)
    order = np.argsort(-vals, kind="stable")[:k]
    comps = vecs[:, order].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


def test_fit_matches_numpy(spark, df, data):
    # f32 storage: compare against numpy PCA of the f32-rounded data
    x = data.astype(np.float32).astype(np.float64)
    model = P.fit_pca(df, k=4)
    mean, comps, vals = _numpy_pca(x, 4)
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.components, comps, atol=1e-8)
    assert np.allclose(model.explained_variance, vals, rtol=1e-9)
    # orthonormal rows
    assert np.allclose(model.components @ model.components.T, np.eye(4), atol=1e-10)


def test_fit_partition_invariant(spark, df):
    a = P.fit_pca(df, k=3)
    b = P.fit_pca(df.repartition(1), k=3)
    c = P.fit_pca(df.repartition(17), k=3)
    for other in (b, c):
        assert np.allclose(a.components, other.components, atol=1e-9)
        assert np.allclose(a.explained_variance, other.explained_variance, rtol=1e-9)


def test_projection_matches_numpy(spark, df, data):
    x = data.astype(np.float32).astype(np.float64)
    model = P.fit_pca(df, k=4)
    rows = P.project_pca(df, model).orderBy("vec_id").collect()
    got = np.array([r["pca"] for r in rows], dtype=np.float64)
    want = (x - model.mean) @ model.components.T
    assert np.allclose(got, want, atol=1e-4)  # f32 output column
    # pass-through columns intact
    assert [r["vec_id"] for r in rows] == list(range(N))


def test_reconstruction_error_monotone(spark, df, data):
    x = data.astype(np.float32).astype(np.float64)
    errs = []
    for k in (1, 2, 4, 8):
        m = P.fit_pca(df, k=k)
        proj = (x - m.mean) @ m.components.T
        recon = proj @ m.components + m.mean
        errs.append(float(((x - recon) ** 2).sum()))
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] == pytest.approx(0.0, abs=1e-6)  # k = d is lossless


def test_uncentered_full_k_preserves_search(spark, df, data):
    # center=False + k=d: projection is an orthogonal rotation, inner
    # products preserved exactly -> shortlist at mult=1 ≡ brute force
    from go_vectorsearch_spark.operators.search import brute_force_topk

    model = P.fit_pca(df, k=D, center=False)
    proj = P.project_pca(df, model)
    q = data[7].tolist()
    got = [
        r["vec_id"]
        for r in P.pca_search_rerank(
            proj, q, model, k_results=10, shortlist_mult=1
        ).collect()
    ]
    want = [
        r["vec_id"]
        for r in brute_force_topk(df, q, 10, id_col="vec_id").collect()
    ]
    assert got == want


def test_reduced_k_recall(spark, df, data):
    # anisotropic corpus: k=4 of 8 with a 4x shortlist should recover
    # most of the exact top-10 (calibrated on the fixed seed)
    from go_vectorsearch_spark.operators.search import brute_force_topk

    model = P.fit_pca(df, k=4, center=False)
    proj = P.project_pca(df, model)
    q = data[11].tolist()
    got = {
        r["vec_id"]
        for r in P.pca_search_rerank(
            proj, q, model, k_results=10, shortlist_mult=4
        ).collect()
    }
    want = {
        r["vec_id"]
        for r in brute_force_topk(df, q, 10, id_col="vec_id").collect()
    }
    assert len(got & want) >= 8


def test_fit_validations(spark, df):
    with pytest.raises(ValueError, match="k"):
        P.fit_pca(df, k=0)
    with pytest.raises(ValueError, match="k"):
        P.fit_pca(df, k=D + 1)
    empty = df.sparkSession.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        P.fit_pca(empty, k=2)
