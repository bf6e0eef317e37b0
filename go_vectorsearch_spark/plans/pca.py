"""PCA embedding compression (scale extension beyond the reference).

The reference stores per-vector 8-bit scalar-quantized embeddings
(compute/quantization.go:71-102) — compression along the VALUE axis. At
the 100 TB design point the other axis matters too: most embedding
corpora concentrate variance in far fewer directions than their nominal
width, and projecting 64-dim vectors to their top-k principal components
shrinks every downstream GEMM, shuffle and index linearly in k/d (the
standard first stage of large-scale semantic-dedup and ANN pipelines,
e.g. SemDeDup's clustering runs on reduced embeddings; public basis:
Pearson 1901 / Jolliffe, Principal Component Analysis).

Spark-first layout:
  * FIT is one distributed pass of mergeable partials: each Arrow batch
    contributes (n, Σx, ΣxᵀX) — a d-vector and a d×d matrix, constant
    size regardless of corpus rows — summed driver-side into the exact
    covariance; the eigendecomposition of a 64×64 matrix is numpy
    noise. No sampling, no iteration, bit-identical under any
    partitioning (float sums are reassociated per-partition, so
    "exact" means up-to-float-reassociation, asserted ~1e-10 in tests).
  * PROJECT is one narrow ``mapInPandas`` GEMM per Arrow batch against
    the broadcast (k × d) component matrix — the assign.py shape; a
    stored column computed once per corpus, like the IVF assignment.
  * SEARCH composes the standard two-stage shape: score the query in
    the REDUCED space against the projected column (k-wide dots — the
    scan reads k floats/row instead of d), shortlist top
    (k_results × mult), then exact-cosine re-rank only the shortlist's
    full vectors. With ``center=False`` the projection is a partial
    orthogonal rotation, so inner products are exactly preserved at
    k = d (shortlist ≡ brute force — the correctness anchor the recall
    tests pin).

Determinism: eigenvectors are sign-normalized (largest-|component|
coordinate made positive) and sorted by (eigenvalue desc, index asc),
so two fits of the same data produce identical models.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray        # (d,) float64 — zeros when center=False
    components: np.ndarray  # (k, d) float64, rows orthonormal
    explained_variance: np.ndarray  # (k,) float64, descending

    @property
    def k(self) -> int:
        return self.components.shape[0]

    @property
    def dim(self) -> int:
        return self.components.shape[1]


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    center: bool = True,
) -> PCAModel:
    """Fit a k-component PCA over a vector column in ONE distributed pass.

    ``center=False`` fits the uncentered second-moment matrix instead of
    the covariance — the right choice when the reduced vectors feed
    cosine/dot scoring, because the projection then preserves inner
    products exactly at k = d (centering shifts the origin and does
    not).
    """
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("fit_pca: empty input")
    d = len(first[0])
    if not 1 <= k <= d:
        raise ValueError(f"fit_pca: k {k} not in [1, {d}]")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        ss = np.zeros((d, d))
        for b in batches:
            if len(b) == 0:
                continue
            m = np.array(b["_v"].tolist(), dtype=np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            ss += m.T @ m
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
        )

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("fit_pca: need at least 2 vectors")
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n if center else np.zeros(d)
    if center:
        cov = (ss - np.outer(mean, s) - np.outer(s, mean) + n * np.outer(mean, mean)) / (n - 1)
    else:
        cov = ss / (n - 1)
    # symmetric eigendecomposition; eigh returns ascending order
    vals, vecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(-vals, kind="stable")[:k]
    comps = vecs[:, order].T  # (k, d)
    # deterministic sign: the largest-|coordinate| entry of each
    # component is made positive (ties resolve to the first index —
    # np.argmax — so the convention is total)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_variance=np.maximum(vals[order], 0.0),
    )


def project_pca(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Attach the k-dim projection of ``vec_col`` as ``out_col``
    (array<float>). One narrow Arrow-batched GEMM per batch against the
    broadcast component matrix; every other column passes through."""
    comps = model.components  # captured in the UDF closure, shipped once
    mean = model.mean
    cols = df.columns

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            m = np.array(b[vec_col].tolist(), dtype=np.float64)
            proj = (m - mean) @ comps.T
            out = b.copy()
            out[out_col] = [r.astype(np.float32).tolist() for r in proj]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<float>"
    return df.mapInPandas(gemm, schema)


def pca_search_rerank(
    df: DataFrame,
    query_vec,
    model: PCAModel,
    k_results: int,
    shortlist_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pca_col: str = "pca",
) -> DataFrame:
    """Two-stage search over a corpus carrying a projected column:
    reduced-space COSINE shortlist (k-wide scan) → exact-cosine re-rank
    of the shortlist's full vectors only. Returns (id_col, score) in
    the engine's (round-6 desc, id asc) total order.

    With an uncentered model at k = d the shortlist order equals the
    exact cosine order (an orthogonal rotation preserves dots AND
    norms — the `ann_pca_exact` anchor pins it), so ``shortlist_mult``
    trades recall for scan width only when k < d — the recall tests
    calibrate the trade on the fixture corpus.
    """
    from go_vectorsearch_spark.functions.vector import cosine_similarity
    from go_vectorsearch_spark.operators.search import query_vec_lit

    q = np.asarray(list(map(float, query_vec)), dtype=np.float64)
    q_red = ((q - model.mean) @ model.components.T).tolist()
    # reduced-space COSINE (k-wide, pure codegen): an orthogonal
    # rotation preserves both dots and norms, so at k = d this ranking
    # is bit-for-bit the full-space cosine ranking; at k < d it is the
    # subspace approximation the shortlist_mult compensates for. Raw
    # dot would NOT match the engine's cosine order even at k = d.
    red_score = cosine_similarity(
        F.col(pca_col).cast("array<double>"), query_vec_lit(q_red)
    )
    shortlist = (
        df.select(id_col, vec_col, red_score.alias("_rs"))
        .orderBy(F.desc(F.round("_rs", 6)), F.asc(id_col))
        .limit(k_results * shortlist_mult)
    )
    exact = shortlist.select(
        id_col,
        cosine_similarity(F.col(vec_col), query_vec_lit(q)).alias("score"),
    )
    return exact.orderBy(F.desc(F.round("score", 6)), F.asc(id_col)).limit(
        k_results
    )
