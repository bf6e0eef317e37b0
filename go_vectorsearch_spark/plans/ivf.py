"""IVF-Flat index pipeline (SURVEY.md §2.8, §3.3) - the flagship plan.

Reference architecture: recursive divide-and-conquer - sample 50k rows,
k-means into <=5 children, route every row to its nearest child via
spill files, recurse per goroutine until subsets <= 10k rows, then
reassign all embeddings, drop small centroids, re-center
(dnc/dnc.go:35-574, dnc/k_means.go:19-212, dnc/dataset.go:19-166).

Spark-first restatement: the recursion exists only because a single Go
process cannot assign a billion rows to a million centroids in one
pass; Spark can. Assignment against broadcast centroids is an
embarrassingly-parallel codegen'd map (operators/assign.py), so the
whole D&C tree collapses into:

    1. distributed Lloyd k-means with k = ceil(N / max_leaf)
       (iterations = full scans; no spill files - the shuffle IS the
       spill machinery, and only |k| x dim aggregates ever move)
    2. a driver while-loop that re-splits any still-oversized leaf
       (the only remnant of the reference recursion, operating on an
       ever-shrinking subset)
    3. prune small leaves + reassign members + re-center - identical
       semantics to the reference's steps 5-7 (dnc/dnc.go:176-296)

Scale notes (the 100 TB design point):
  * centroid set is broadcast: k*dim*8 bytes - 1M centroids x 64 dims
    = 512 MB is the practical ceiling; beyond that, shard the
    assignment by centroid blocks (not needed at any tested SF).
  * every Lloyd iteration is one scan + one (k x dim)-row shuffle
    (map-side partial agg from vector_mean) - data volume per
    iteration is independent of N except for the scan.
  * the assigned table should be written partitionBy("centroid_id")
    so nprobe search prunes partitions exactly like the reference's
    indexed centroid_id column (database/model.go:16).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_vectorsearch_spark.functions.vector import vector_mean
from go_vectorsearch_spark.operators.assign import assign_nearest, assign_with_matrix
from go_vectorsearch_spark.operators.search import brute_force_topk

CENTROID_SCHEMA = "centroid_id long, centroid_vec array<double>"


def _quantize_f32_roundtrip(mat: np.ndarray) -> np.ndarray:
    """Driver-side f32 quantize->dequantize of the (tiny) centroid matrix.

    The reference quantizes centroids every k-means iteration and
    converges on byte equality (dnc/k_means.go:80-116); reproducing
    that keeps iteration counts finite and convergence exact. The
    centroid matrix is k x dim - always driver-sized.
    """
    out = np.empty_like(mat, dtype=np.float64)
    for i, v in enumerate(mat):
        v32 = v.astype(np.float32)
        lo = np.float32(min(v32.min(), 0.0))
        hi = np.float32(max(v32.max(), 0.0))
        if hi - lo == 0:
            out[i] = 0.0
            continue
        clamped = np.clip(v32, lo, hi).astype(np.float32)
        q = np.trunc(
            ((clamped - lo) / np.float32(hi - lo) * np.float32(255)).astype(np.float32)
        )
        out[i] = (
            lo + (q.astype(np.float32) / np.float32(255)).astype(np.float32) * np.float32(hi - lo)
        ).astype(np.float32)
    return out


def _centroids_df(spark: SparkSession, mat: np.ndarray, ids: list[int]) -> DataFrame:
    rows = [(int(cid), [float(x) for x in vec]) for cid, vec in zip(ids, mat)]
    return spark.createDataFrame(rows, CENTROID_SCHEMA)


def deterministic_sample(df: DataFrame, n: int, id_col: str) -> DataFrame:
    """C1: uniform-ish sample, deterministic across runs and engines.

    The reference uses a wall-clock-seeded Fisher-Yates
    (dnc/sampling.go:15-96); we order by md5(id) - a fixed random
    permutation - and take n. At scale this is a TakeOrdered (partial
    top-n per partition + merge), not a full sort.
    """
    return df.orderBy(F.md5(F.col(id_col).cast("string"))).limit(n)


def _partial_stats(df: DataFrame, mat: np.ndarray, ids: list[int], vec_col: str):
    """One fused pass: per Arrow batch, GEMM-assign rows to centroids and
    emit per-cluster (count, sum) partials. One Spark job, no shuffle -
    the map-side-combine shape of distributed Lloyd. Returns
    (counts[k], sums[k x d]) combined on the driver (k x d doubles,
    always driver-sized)."""
    import pandas as pd

    order = np.argsort(ids)
    sorted_ids = np.asarray(ids)[order]
    C = mat[order].astype(np.float64)
    Cn = np.linalg.norm(C, axis=1, keepdims=True)
    Cn[Cn == 0] = 1.0
    Cnorm = C / Cn
    k, d = C.shape

    def stats(batches):
        acc_cnt = np.zeros(k, dtype=np.int64)
        acc_sum = np.zeros((k, d), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xn = np.linalg.norm(X, axis=1, keepdims=True)
            zero = Xn[:, 0] == 0
            Xn[zero] = 1.0
            sims = (X / Xn) @ Cnorm.T
            sims[zero] = 0.0
            arg = sims.argmax(axis=1)
            np.add.at(acc_cnt, arg, 1)
            np.add.at(acc_sum, arg, X)
        nz = np.nonzero(acc_cnt)[0]
        yield pd.DataFrame(
            {
                "pos": nz.astype("int64"),
                "cnt": acc_cnt[nz],
                "sums": [acc_sum[i].tolist() for i in nz],
            }
        )

    partials = df.select(vec_col).mapInPandas(
        stats, schema="pos long, cnt long, sums array<double>"
    ).collect()
    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros((k, d), dtype=np.float64)
    for r in partials:
        counts[r["pos"]] += r["cnt"]
        sums[r["pos"]] += np.asarray(r["sums"])
    # map back to the caller's id order
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    return counts[inv], sums[inv], sorted_ids


def kmeans(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iters: int = 20,
    sample_size: int = 50_000,
    init_oversample: int = 5,
    quantize_iterations: bool = True,
) -> DataFrame:
    """C2: mini-batch-style k-means, Spark-distributed Lloyd iterations.

    Mirrors the reference's structure (dnc/k_means.go:19-212):
      * fit on a deterministic sample (SAMPLE_SIZE=50k,
        config/constants.go:10)
      * superset init: start from k*init_oversample distinct sampled
        points (SUPERSET_MUL=5, k_means.go:19-40), after one
        assignment keep the k largest clusters (T4, k_means.go:120-140)
      * Lloyd: cosine-argmax assign (J5) + per-cluster mean (A3)
      * per-iteration f32 quantize of centroids + byte-equality
        convergence (k_means.go:80-116), iteration cap
        (KMEANS_ITTERATION_LIMIT=1000 in the reference; default 20
        here - quantized convergence normally lands well under that)

    Returns a DataFrame (centroid_id long, centroid_vec array<double>)
    with centroid_id in [0, k).
    """
    spark = df.sparkSession
    sample = deterministic_sample(df, sample_size, id_col).select(id_col, vec_col)
    sample = sample.persist()
    try:
        n_sample = sample.count()
        k = max(1, min(k, n_sample))
        k0 = min(n_sample, k * init_oversample)

        init = deterministic_sample(sample, k0, id_col)
        mat = np.array(
            [r[0] for r in init.select(vec_col).collect()], dtype=np.float64
        )
        ids = list(range(len(mat)))

        if k0 > k:
            # superset -> set: one fused pass, keep k largest clusters (T4)
            counts, _, sorted_ids = _partial_stats(sample, mat, ids, vec_col)
            by_size = sorted(zip(ids, counts), key=lambda t: (-t[1], t[0]))[:k]
            keep = [c for c, _ in by_size]
            mat = mat[keep]
            ids = list(range(len(mat)))

        prev = None
        for _ in range(max_iters):
            counts, sums, _ = _partial_stats(sample, mat, ids, vec_col)
            new_mat = mat.copy()  # empty clusters keep their centroid
            nz = counts > 0
            new_mat[nz] = sums[nz] / counts[nz, None]
            if quantize_iterations:
                new_mat = _quantize_f32_roundtrip(new_mat)
            if prev is not None and np.array_equal(new_mat, prev):
                mat = new_mat
                break
            prev = new_mat
            mat = new_mat
        return _centroids_df(spark, mat, ids)
    finally:
        sample.unpersist()


@dataclass
class IVFIndex:
    """centroids + per-row assignment, the queryable index."""

    centroids: DataFrame  # centroid_id long, centroid_vec array<double>
    assigned: DataFrame  # original columns + centroid_id


def build_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_leaf: int = 10_000,
    sample_size: int = 50_000,
    max_split_rounds: int = 4,
    min_leaf: int | None = None,
) -> IVFIndex:
    """C3/C5: full index build.

    Flat distributed k-means with k = ceil(N / max_leaf) replaces the
    reference's recursion (see module docstring); a driver while-loop
    then re-splits any leaf still > max_leaf (each round touches only
    the oversized subset, like the reference recursing into one
    subtree, dnc/dnc.go:300-400). Finally small leaves
    (< max_leaf/10, dnc/dnc.go:486) are dissolved: members reassigned
    to surviving centroids, which are then re-centered to the member
    mean (C6, dnc/dnc.go:458-574, 402-456).
    """
    df = df.persist()
    n = df.count()
    k = max(1, math.ceil(n / max_leaf))

    centroids = kmeans(
        df, k, id_col=id_col, vec_col=vec_col, sample_size=sample_size
    )
    assigned = assign_nearest(df, centroids, vec_col=vec_col, out_col="centroid_id")

    # split oversized leaves (driver loop over a shrinking subset)
    for _ in range(max_split_rounds):
        sizes = assigned.groupBy("centroid_id").agg(F.count("*").alias("cnt"))
        oversized = [
            (r["centroid_id"], r["cnt"]) for r in sizes.filter(F.col("cnt") > max_leaf).collect()
        ]
        if not oversized:
            break
        next_id = centroids.agg(F.max("centroid_id")).head()[0] + 1
        new_parts = []
        keep = assigned.filter(
            ~F.col("centroid_id").isin([c for c, _ in oversized])
        )
        for cid, cnt in oversized:
            subset = assigned.filter(F.col("centroid_id") == cid).drop("centroid_id")
            kk = max(2, math.ceil(cnt / max_leaf))
            sub_cents = kmeans(
                subset, kk, id_col=id_col, vec_col=vec_col, sample_size=sample_size
            ).withColumn("centroid_id", F.col("centroid_id") + F.lit(next_id))
            next_id += kk
            new_parts.append(
                assign_nearest(subset, sub_cents, vec_col=vec_col, out_col="centroid_id")
            )
        assigned = keep
        for p in new_parts:
            assigned = assigned.unionByName(p)
        centroids = recenter(assigned, vec_col)  # refresh centroid set from data

    # prune small centroids, reassign their members, re-center
    if min_leaf is None:
        min_leaf = max_leaf // 10
    index = IVFIndex(centroids=recenter(assigned, vec_col), assigned=assigned)
    index = prune_small(index, vec_col=vec_col, min_size=min_leaf)
    df.unpersist()
    return index


def recenter(assigned: DataFrame, vec_col: str) -> DataFrame:
    """C5 step 7: centroid := mean of member vectors (dnc/dnc.go:402-456)."""
    return vector_mean(assigned, ["centroid_id"], vec_col, out_col="centroid_vec")


def prune_small(index: IVFIndex, vec_col: str, min_size: int) -> IVFIndex:
    """C6: dissolve centroids with < min_size members; reassign members
    to the nearest surviving centroid; re-center survivors
    (dnc/dnc.go:458-574).
    """
    sizes = index.assigned.groupBy("centroid_id").agg(F.count("*").alias("cnt"))
    survivors = sizes.filter(F.col("cnt") >= min_size).select("centroid_id")
    n_surv = survivors.count()
    if n_surv == 0 or n_surv == sizes.count():
        return IVFIndex(centroids=recenter(index.assigned, vec_col), assigned=index.assigned)

    surviving_cents = index.centroids.join(F.broadcast(survivors), "centroid_id")
    orphans = index.assigned.join(
        F.broadcast(survivors), "centroid_id", "left_anti"
    ).drop("centroid_id")
    keep = index.assigned.join(F.broadcast(survivors), "centroid_id", "left_semi")
    reassigned = assign_nearest(
        orphans, surviving_cents, vec_col=vec_col, out_col="centroid_id"
    )
    assigned = keep.unionByName(reassigned)
    return IVFIndex(centroids=recenter(assigned, vec_col), assigned=assigned)


def write_partitioned(index: IVFIndex, path: str) -> None:
    """Persist the index partitioned by centroid_id - the parquet analog
    of the reference's indexed FK column (database/model.go:16): nprobe
    search then prunes partitions at the source.
    """
    index.assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/assigned"
    )
    index.centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def read_index(spark: SparkSession, path: str) -> IVFIndex:
    return IVFIndex(
        centroids=spark.read.parquet(f"{path}/centroids"),
        assigned=spark.read.parquet(f"{path}/assigned"),
    )


def nearest_centroids(
    centroids: DataFrame, query_vec, nprobe: int
) -> list[int]:
    """T1: pick the nprobe nearest centroids to the query (tiny table,
    driver-side math like the reference's in-process scan,
    server/search.go:202-227).
    """
    rows = centroids.collect()
    if not rows:
        return []
    q = np.array(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    scored = []
    for r in rows:
        c = np.array(r["centroid_vec"], dtype=np.float64)
        denom = qn * np.linalg.norm(c)
        sim = float(c @ q / denom) if denom else 0.0
        scored.append((sim, int(r["centroid_id"])))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [cid for _, cid in scored[:nprobe]]


def ivf_search(
    index: IVFIndex,
    query_vec,
    k: int,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    doc_col: str | None = None,
) -> DataFrame:
    """Search: prune to the nprobe nearest partitions, then brute-force
    top-k inside them (server/search.go:234-273). nprobe >= |centroids|
    degrades to exact brute force - the parity case the oracle checks.

    The isin filter is a pushed-down partition predicate when the
    assigned table was written partitionBy("centroid_id") - only the
    probed inverted lists are read, the Spark analog of the
    reference's `centroid_id IN (...)` indexed scan.
    """
    probe_ids = nearest_centroids(index.centroids, query_vec, nprobe)
    pruned = index.assigned.filter(F.col("centroid_id").isin(probe_ids))
    return brute_force_topk(
        pruned, query_vec, k, id_col=id_col, vec_col=vec_col, doc_col=doc_col
    )
