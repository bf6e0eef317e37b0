"""ANN tuning-map measurement: recall@10 + wall per quality-dial value.

Produces the BASELINE.md r10 table — the measured companion of the
registry's rows-only `ann_tradeoff_sweep` diagnostics entry. Runs each
configuration as its OWN timed search job (the serving shape: one
query, one dial setting), against the registry's cached per-corpus
stores (IVF assignment, LSH bucket column, PQ codes, PCA projection),
so timings exclude the one-time builds exactly like bench.py bills
them. Median of 3 warm runs per configuration.

Usage: python tools/ann_sweep.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark import queries as Q  # noqa: E402
from go_vectorsearch_spark.operators.search import score_cosine  # noqa: E402
from go_vectorsearch_spark.plans.ivf import ivf_search  # noqa: E402
from go_vectorsearch_spark.plans.lsh import lsh_search  # noqa: E402
from go_vectorsearch_spark.plans.pq import pq_search  # noqa: E402

K = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-sweep")
    qvec = Q._qvec(spark, sf_dir)
    bf = Q._bf_ids(spark, sf_dir, K)

    index = Q._ivf_index(spark, sf_dir)
    bucketed = Q._lsh_bucketed_cached(spark, sf_dir)
    books, coded = Q._pq_cached(spark, sf_dir)
    model, proj = Q._pca_exact_cached(spark, sf_dir)
    n_cent = index.centroids.count()

    def timed(make_df):
        walls, ids = [], None
        make_df().collect()  # warm (codegen/compile)
        for _ in range(3):
            t0 = time.perf_counter()
            ids = {r["vec_id"] for r in make_df().collect()}
            walls.append(time.perf_counter() - t0)
        return sorted(walls)[1], ids

    rows = []

    def add(family, param, make_df):
        wall, ids = timed(make_df)
        rows.append((family, param, len(bf & ids) / len(bf), wall))
        print(f"  {family} {param}: recall {rows[-1][2]:.2f}, {wall:.3f}s")

    print(f"sweep at {sf_dir} ({n_cent} IVF centroids)")
    for n in (1, 2, 4, n_cent):
        add("ivf_nprobe", str(n) if n != n_cent else f"all({n})",
            lambda n=n: ivf_search(index, qvec, k=K, nprobe=n))
    for r in (0, 1, 2):
        add("lsh_radius", str(r),
            lambda r=r: lsh_search(
                None, qvec, k=K, probe_radius=r,
                planes=Q._LSH_PLANES_SMALL, bucketed=bucketed))
    for rr in (None, 25, 50):
        add("pq_rerank", "adc" if rr is None else str(rr),
            lambda rr=rr: pq_search(coded, books, qvec, k=K, rerank=rr))
    q = np.asarray(list(qvec), dtype=np.float64)
    for kk in sorted({8, 16, 32, model.k}):
        qk = [float(x) for x in (model.components[:kk] @ q)]

        def pca_leg(kk=kk, qk=qk):
            scored = score_cosine(
                proj.select("vec_id", F.slice("pca", 1, kk).alias("_pk")),
                qk, "_pk",
            )
            return (
                scored.orderBy(F.desc(F.round("score", 6)), F.asc("vec_id"))
                .limit(K)
            )

        add("pca_k", str(kk), pca_leg)

    print("\n| family | param | recall@10 | wall (median of 3, warm) |")
    print("|---|---|---|---|")
    for fam, param, rec, wall in rows:
        print(f"| {fam} | {param} | {rec:.2f} | {wall:.3f} s |")


if __name__ == "__main__":
    main()
