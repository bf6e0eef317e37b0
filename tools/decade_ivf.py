"""Two-decade measurement for the IVF flagship (r13).

The r12 verdict's task 3: dedup, the budget sampler and the composed
curation chain all carry 5k -> 50k -> 500k decade rows in BASELINE.md;
the ANN family had only sf1. Measured here at 5k / 50k / 500k vectors
(dim 64, a 64-center gaussian mixture so the inverted lists are real
clusters, generated deterministically per rung and written to parquet
once so every stage reads the on-disk layout):

1. ivf_build      — the divide-and-conquer build (plans/ivf.build_index,
   _force_distributed so every rung exercises the cluster path: sample
   TakeOrdered, driver Lloyd on the bounded sample, distributed GEMM
   assignment, split/prune rounds). k = ceil(N / max_leaf) grows with
   the corpus — the thing to prove linear-or-better.
2. ivf_store_write — write_partitioned(partitionBy centroid_id): the
   one-time layout cost (file count O(centroids) by construction).
3. ivf_search     — probed top-10 against the STORED layout at nprobe
   1 / 2 / 4, median of 3 after a cold run. Leaf size is bounded by
   max_leaf, so the pruned read is ~nprobe x max_leaf rows at EVERY
   rung — the wall should stay ~flat while the corpus grows 100x
   (partition pruning is the index).
4. recall@10      — vs exact brute force over the same stored table.

Usage: python tools/decade_ivf.py [workdir]
"""

from __future__ import annotations

import shutil
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark.operators.search import brute_force_topk  # noqa: E402
from go_vectorsearch_spark.plans.ivf import (  # noqa: E402
    build_index,
    ivf_search,
    read_index,
    write_partitioned,
)

DIM = 64
MAX_LEAF = 500
K = 10


def synth_vectors(spark, n: int):
    """Deterministic gaussian-mixture-ish corpus: md5-derived unit
    centers, one per ~MAX_LEAF vectors (cluster granularity matches the
    index's leaf design point at every rung — the geometry IVF exists
    for; a FIXED center count would make the 100x rung split each true
    cluster over ~24 lists and measure probe-count shortfall, not the
    engine); each vector = its (vec_id % n_centers) center +
    md5-derived noise. Pure column expressions — no driver-side
    materialization at any n."""
    n_centers = max(8, n // MAX_LEAF)

    def hash_unit(key: F.Column, i: int) -> F.Column:
        # uniform in [-1, 1) from an md5 nibble-slice of key:i
        h = F.conv(
            F.substring(F.md5(F.concat(key, F.lit(f":{i}"))), 1, 8), 16, 10
        ).cast("double")
        return h / F.lit(float(1 << 31)) - 1.0

    cid = (F.col("vec_id") % n_centers).cast("string")
    vid = F.col("vec_id").cast("string")
    vec = F.array(
        *[
            hash_unit(F.concat(F.lit("c"), cid), i)
            + 0.25 * hash_unit(F.concat(F.lit("v"), vid), i)
            for i in range(DIM)
        ]
    ).cast("array<float>")
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade_ivf"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("decade-ivf")

    rows = []
    for label, n, parts in (
        ("base (5k)", 5_000, 8),
        ("10x (50k)", 50_000, 32),
        ("100x (500k, ~sf10)", 500_000, 64),
    ):
        src = f"{work}/{label.split(' ')[0]}/vectors"
        synth_vectors(spark, n).repartition(parts).write.parquet(src)
        df = spark.read.parquet(src)

        t0 = time.perf_counter()
        index = build_index(
            df, max_leaf=MAX_LEAF, _force_distributed=True
        )
        n_cent = index.centroids.count()  # materializes the build
        build_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        store = f"{work}/{label.split(' ')[0]}/index"
        write_partitioned(index, store)
        store_wall = time.perf_counter() - t0

        stored = read_index(spark, store)
        qvec = df.filter(F.col("vec_id") == 1).head()["embedding"]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(stored.assigned, qvec, K).collect()
        }
        rows.append((label, n_cent, "ivf_build", build_wall, None))
        rows.append((label, n_cent, "ivf_store_write", store_wall, None))
        for nprobe in (1, 2, 4):
            walls, got = [], None
            ivf_search(stored, qvec, K, nprobe=nprobe).collect()  # cold
            for _ in range(3):
                t0 = time.perf_counter()
                got = {
                    r["vec_id"]
                    for r in ivf_search(stored, qvec, K, nprobe=nprobe).collect()
                }
                walls.append(time.perf_counter() - t0)
            rows.append(
                (
                    label,
                    n_cent,
                    f"ivf_search nprobe={nprobe}",
                    sorted(walls)[1],
                    len(exact & got) / K,
                )
            )

    print("\n| corpus | centroids | entry | wall | recall@10 |")
    print("|---|---|---|---|---|")
    for label, n_cent, entry, wall, recall in rows:
        rec = "—" if recall is None else f"{recall:.2f}"
        print(f"| {label} | {n_cent} | {entry} | {wall:.2f} s | {rec} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
