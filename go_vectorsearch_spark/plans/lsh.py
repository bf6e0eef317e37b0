"""Random-hyperplane LSH for approximate nearest-neighbor search.

The scale path beside the IVF-Flat pipeline (plans/ivf.py): where IVF needs
a k-means build job, LSH bucketing is a single stateless projection — at
100 TB you bucket on write (one narrow int column, partition/cluster by
it) and a query touches only its own bucket's partitions via partition
pruning. Classic sign-random-projection (Charikar SimHash for angles),
with Rademacher ±1 hyperplanes derived from md5 bits so that:

  * every engine reproduces the planes exactly (no RNG state) — the
    DuckDB oracles in queries.py recompute identical buckets;
  * the projection is a pure column expression (zip_with + aggregate over
    a literal ±1 array), whole-stage-codegen'd, no Python in the path.

Multi-probe: Hamming-adjacent buckets (flip one bit) widen recall without
rebucketing — the standard trade against nprobe in IVF.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.search import brute_force_topk

N_BITS = 16
LSH_SEED = 0


def rademacher_planes(dim: int, n_bits: int = N_BITS, seed: int = LSH_SEED) -> list[list[int]]:
    """±1 hyperplanes: sign[b][i] = 2·(md5_int32(f"{seed}:{b}:{i}") % 2) − 1.

    Content-addressed (no RNG), so driver code, executors, and the SQL
    oracle all derive the same planes independently.
    """
    planes = []
    for b in range(n_bits):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{seed}:{b}:{i}".encode()).hexdigest()[:8], 16)
            row.append(2 * (h % 2) - 1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Bucket id (long) of a vector: bit b = 1 iff vec · plane_b > 0.

    One nested fold over a single flat plane Literal, not one unrolled
    zip_with/aggregate subtree per bit: the unrolled form was ~n_bits x
    dim expression nodes (16x64 = 1024), whose whole-stage-codegen
    compile alone cost ~3 s per query — the generic loop compiles in
    milliseconds and evaluates identically. Per-bit dots accumulate in
    the same index order as the old zip_with fold, so bucket values
    (and every stored _bucket column / SQL oracle) are bit-identical.
    """
    n_bits, dim = len(planes), len(planes[0])
    flat = F.lit([float(s) for row in planes for s in row])
    # fold bits high -> low as acc*2 + bit_b, i.e. Horner form of
    # sum(bit_b << b) without needing a column-valued shift amount
    return F.aggregate(
        F.sequence(F.lit(n_bits - 1), F.lit(0), F.lit(-1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc * F.lit(2).cast("long")
        + F.when(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                F.lit(0.0),
                lambda a, i: a
                + F.element_at(vec, i + F.lit(1)).cast("double")
                * F.element_at(flat, b * dim + i + F.lit(1)),
            )
            > 0,
            F.lit(1).cast("long"),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )


def bucket_of(vec: list[float], planes: list[list[int]]) -> int:
    """Driver-side bucket of a query vector (same arithmetic as lsh_bucket)."""
    out = 0
    for b, signs in enumerate(planes):
        dot = 0.0
        for x, s in zip(vec, signs):
            dot += float(x) * s
        if dot > 0:
            out |= 1 << b
    return out


def _hamming_neighbors(bucket: int, n_bits: int, radius: int) -> list[int]:
    """Buckets within Hamming distance ``radius`` (0, 1, or 2).

    Probe counts: 1, 1 + n, 1 + n + C(n, 2) — at 16 bits radius 2 is
    137 buckets, still a tiny IN-list/partition filter next to the
    2^16 bucket space. Radius ≥ 3 would probe C(n, 3)-style bucket
    counts approaching a meaningful fraction of the space; at that
    point fewer bits (bigger buckets) is the right recall dial, so it
    stays a real error (not an assert: under python -O an assert would
    silently return fewer buckets than the caller asked for)."""
    if radius > 2:
        raise ValueError(
            f"multi-probe radius {radius} unsupported (max 2); "
            "use fewer plane bits for higher recall instead"
        )
    out = [bucket]
    if radius >= 1:
        out += [bucket ^ (1 << b) for b in range(n_bits)]
    if radius >= 2:
        out += [
            bucket ^ (1 << a) ^ (1 << b)
            for a in range(n_bits)
            for b in range(a + 1, n_bits)
        ]
    return out


def lsh_search(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    probe_radius: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[int]] | None = None,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """ANN search: score only rows whose bucket is (Hamming-)near the
    query's bucket. With data written ``partitionBy("bucket")`` the filter
    becomes partition pruning and the scan never touches other buckets.

    ``bucketed`` — a (persisted) frame already carrying the ``_bucket``
    column for the SAME planes — skips rebucketing, and therefore
    REQUIRES ``planes`` (the ones the frame was bucketed with): deriving
    fresh default planes here would hash the query into a different
    bucket space than the stored column and silently return empty or
    garbage candidates. Pass it when probing several radii/queries
    against one corpus (the bucket-on-write shape).
    """
    if bucketed is not None and planes is None:
        raise ValueError(
            "lsh_search: a pre-bucketed frame requires the planes it was "
            "bucketed with — fresh default planes would probe a different "
            "bucket space and silently miss everything"
        )
    if planes is None:
        planes = rademacher_planes(len(query_vec))
    qb = bucket_of(list(query_vec), planes)
    probes = _hamming_neighbors(qb, len(planes), probe_radius)
    if bucketed is None:
        bucketed = emb.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, id_col=id_col, vec_col=vec_col)
