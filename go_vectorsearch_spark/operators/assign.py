"""Nearest-centroid assignment (SURVEY.md §2.3 J5, §2.4 A5, §2.7 V3).

The reference computes B·Aᵀ with BLAS Dgemm and takes a per-row argmax
(compute/cosine.go:70-125, cosine_gonum.go:60-116) to assign every
vector to its nearest centroid. The Spark-first shape is a cross join
against the *broadcast* centroid table (centroid sets are small - the
reference caps leaves at 10k vectors so |centroids| ~ N/10k) followed
by a per-row max. Tie-breaking: the reference keeps the FIRST maximum
(strict ``>``, compute/cosine.go:113-117), i.e. the lowest centroid
index wins ties - reproduced here with an explicit (sim, -id) struct
max, since Spark's ``max_by`` tie behavior is unspecified.

Scale note: the cross join is |rows| x |centroids| expression
evaluations inside whole-stage codegen, embarrassingly parallel, no
shuffle (broadcast). The groupBy(row) that follows would be a shuffle,
so we avoid it entirely: the argmax is computed with aggregate() over
the broadcast array *inside one projection* when centroids fit a
literal/broadcast array, which is the default path below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_vectorsearch_spark.functions.vector import dot, l2_norm


def assign_nearest(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    out_col: str = "assigned_id",
    sim_col: str | None = None,
) -> DataFrame:
    """Assign each row to its nearest centroid by cosine similarity.

    Joins nothing and shuffles nothing on the big side: the centroid
    table is collapsed into a single broadcastable array-of-structs
    literal column, and the per-row argmax runs as one codegen'd
    ``aggregate`` expression - the exact Spark analogue of the
    reference's "stream rows, GEMM against the in-memory centroid
    matrix" (dnc/dnc.go:199-221), minus the hand-rolled batching.

    Ties keep the smallest centroid id (reference first-max semantics).
    """
    cent_rows = centroids.select(
        F.struct(
            F.col(centroid_id_col).alias("cid"),
            F.col(centroid_vec_col).alias("cvec"),
        ).alias("c")
    ).agg(F.collect_list("c").alias("cents"))

    with_cents = df.crossJoin(F.broadcast(cent_rows))

    v = F.col(vec_col)
    vnorm = l2_norm(v)

    def sim_to(c: Column) -> Column:
        denom = vnorm * l2_norm(c["cvec"])
        return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(v, c["cvec"]) / denom)

    # Single-pass argmax over the centroid array: fold keeping the best
    # (sim, -cid) pair; strict > keeps the first (lowest-id) max.
    best = F.aggregate(
        F.col("cents"),
        F.struct(
            F.lit(float("-inf")).alias("sim"), F.lit(None).cast("long").alias("cid")
        ),
        lambda acc, c: F.when(
            sim_to(c) > acc["sim"],
            F.struct(sim_to(c).alias("sim"), c["cid"].cast("long").alias("cid")),
        ).otherwise(acc),
    )

    out = with_cents.withColumn("_best", best).drop("cents")
    result = out.withColumn(out_col, F.col("_best")["cid"])
    if sim_col is not None:
        result = result.withColumn(sim_col, F.col("_best")["sim"])
    return result.drop("_best")
