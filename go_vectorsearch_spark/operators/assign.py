"""Nearest-centroid assignment (SURVEY.md §2.3 J5, §2.4 A5, §2.7 V3).

The reference computes B·Aᵀ with BLAS Dgemm and takes a per-row argmax
(compute/cosine.go:70-125, cosine_gonum.go:60-116) to assign every
vector to its nearest centroid. Tie-breaking: the reference keeps the
FIRST maximum (strict ``>``, compute/cosine.go:113-117), i.e. the
lowest centroid index wins ties.

Two physical strategies, chosen by centroid count:

* ``expr``  - the centroid table collapses into one broadcast
  array-of-structs literal; per-row cosine argmax runs as codegen'd
  transform/array_max expressions. Zero shuffle, zero Python. Best for
  small k where JVM expression evaluation beats Arrow transfer.
* ``gemm``  - mapInPandas: each Arrow batch becomes an (n x d) numpy
  matrix multiplied against the broadcast (k x d) centroid matrix -
  one BLAS GEMM per batch, the literal Spark translation of the
  reference's Dgemm path. Best for larger k (the 100 TB design point:
  per-row cost is k*d multiply-adds either way, but GEMM runs at
  memory bandwidth while expression eval is interpreted per element).

Both are narrow (no shuffle): assignment cost scales linearly with
rows and is embarrassingly parallel across partitions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_vectorsearch_spark.functions.vector import dot, l2_normalize

# Centroid count at which the GEMM path takes over. Low on purpose: the
# expression path embeds k x dim float literals into codegen (compile
# time grows with the tree), so it only wins for single-digit k.
GEMM_THRESHOLD = 8


def assign_nearest(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    out_col: str = "assigned_id",
    sim_col: str | None = None,
    method: str = "auto",
) -> DataFrame:
    """Assign each row to its nearest centroid by cosine similarity.

    Ties keep the smallest centroid id (reference first-max semantics).
    ``method``: "expr" | "gemm" | "auto" (auto picks by centroid count).
    """
    cents = [
        (int(r[centroid_id_col]), np.asarray(r[centroid_vec_col], dtype=np.float64))
        for r in centroids.select(centroid_id_col, centroid_vec_col).collect()
    ]
    return assign_nearest_mat(df, cents, vec_col, out_col, sim_col, method)


def assign_nearest_mat(
    df: DataFrame,
    cents: list[tuple[int, np.ndarray]],
    vec_col: str = "embedding",
    out_col: str = "assigned_id",
    sim_col: str | None = None,
    method: str = "auto",
) -> DataFrame:
    """``assign_nearest`` for centroids already on the driver as
    (id, vector) pairs — the k-means fit produces exactly this, so
    callers like ``build_index`` skip a createDataFrame→collect
    round-trip of data that never left the driver."""
    if not cents:
        raise ValueError("assign_nearest: empty centroid set")
    cents = sorted(cents, key=lambda t: t[0])  # asc id => argmax first-hit = lowest id

    if method == "auto":
        method = "gemm" if len(cents) >= GEMM_THRESHOLD else "expr"
    if method == "gemm":
        return _assign_gemm(df, cents, vec_col, out_col, sim_col)
    return _assign_expr(df, cents, vec_col, out_col, sim_col)


def _assign_expr(
    df: DataFrame,
    cents: list[tuple[int, np.ndarray]],
    vec_col: str,
    out_col: str,
    sim_col: str | None,
) -> DataFrame:
    """Codegen'd path: pre-normalized centroid literals, one dot per
    (row, centroid), array_max over (sim, -id) structs."""
    normed = []
    for cid, v in cents:
        n = np.linalg.norm(v)
        normed.append((cid, v / n if n > 0 else v))

    # F.lit(list) makes each centroid vector a single array Literal —
    # the F.array(*[lit per dim]) form was a CreateArray with k x d
    # literal children re-evaluated per row (same codegen-tree collapse
    # as dedup._signature_from_hashes / plans/lsh.lsh_bucket)
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("cid"),
                F.lit([float(x) for x in v]).alias("cvec"),
            )
            for cid, v in normed
        ]
    )

    vn = l2_normalize(F.col(vec_col))
    tmp = df.withColumn("_vn", vn).withColumn("_cents", cent_arr)
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            dot(F.col("_vn"), c["cvec"]).alias("sim"),
            (-c["cid"]).alias("negid"),
        ),
    )
    best = F.array_max(scored)
    out = tmp.withColumn("_best", best).drop("_vn", "_cents")
    result = out.withColumn(out_col, -F.col("_best")["negid"])
    if sim_col is not None:
        result = result.withColumn(sim_col, F.col("_best")["sim"])
    return result.drop("_best")


def _assign_gemm(
    df: DataFrame,
    cents: list[tuple[int, np.ndarray]],
    vec_col: str,
    out_col: str,
    sim_col: str | None,
) -> DataFrame:
    """Arrow-batch GEMM path (reference Dgemm analog,
    compute/cosine_gonum.go:60-116): per batch, X_norm @ C_normᵀ then
    row argmax. numpy argmax keeps the first (lowest-id) max."""
    ids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.vstack([v for _, v in cents])
    Cn = np.linalg.norm(C, axis=1, keepdims=True)
    Cn[Cn == 0] = 1.0
    C = C / Cn

    out_fields = df.schema.fields + [T.StructField(out_col, T.LongType())]
    if sim_col is not None:
        out_fields = out_fields + [T.StructField(sim_col, T.DoubleType())]
    out_schema = T.StructType(out_fields)
    in_cols = [f.name for f in df.schema.fields]

    def assign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xn = np.linalg.norm(X, axis=1, keepdims=True)
            zero = Xn[:, 0] == 0
            Xn[zero] = 1.0
            sims = (X / Xn) @ C.T
            sims[zero] = 0.0  # zero vectors: cosine defined as 0 (V2 guard)
            arg = sims.argmax(axis=1)
            res = pdf[in_cols].copy()
            res[out_col] = ids[arg]
            if sim_col is not None:
                res[sim_col] = sims[np.arange(len(arg)), arg]
            yield res

    return df.mapInPandas(assign_batches, schema=out_schema)
