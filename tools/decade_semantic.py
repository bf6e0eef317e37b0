"""Two-decade measurement for SemDeDup-style semantic dedup (r13).

`dedup_semantic` rotated into the driver window this round; this prices
the operator's scale shape: one exchange on the cluster id feeding
applyInPandas with chunked per-cluster GEMM, task memory bounded by the
cluster size. Rungs grow the corpus 10x while the cluster GRANULARITY
stays fixed (one cluster per ~500 vectors — the IVF leaf design point,
matching how the Engine composes it with the index assignment), so the
cluster count grows with the corpus and the wall should scale ~linearly
(embarrassing parallelism over clusters) with NO quadratic term — the
in-cluster greedy is the only O(size^2)-ish piece and its operand is
bounded by construction.

Vectors reuse tools/decade_ivf.py's deterministic md5-mixture generator
(near-dup structure inside every cluster, so the greedy really drops
rows at every rung). Protocol: corpus written to parquet once per rung,
median of 3 after one cold.

Usage: python tools/decade_semantic.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_vectorsearch_spark.operators.dedup import semantic_dedup  # noqa: E402
from go_vectorsearch_spark import get_spark  # noqa: E402
from tools.decade_dedup import _timed  # noqa: E402
from tools.decade_ivf import MAX_LEAF, synth_vectors  # noqa: E402


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade_semantic"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("decade-semantic")

    print("\n| corpus | clusters | semantic_dedup wall | dropped |")
    print("|---|---|---|---|")
    for label, n, parts in (
        ("base (5k)", 5_000, 8),
        ("10x (50k)", 50_000, 32),
        ("100x (500k, ~sf10)", 500_000, 64),
    ):
        src = f"{work}/{label.split(' ')[0]}"
        synth_vectors(spark, n).repartition(parts).write.parquet(src)
        n_clusters = max(8, n // MAX_LEAF)
        df = spark.read.parquet(src).select(
            "vec_id",
            "embedding",
            (F.col("vec_id") % n_clusters).alias("centroid_id"),
        )

        # BOTH greedy regimes: drop-heavy (0.9 — nearly everything is a
        # near-dup of its cluster keeper, so the kept set stays tiny:
        # the cheapest case) and keep-heavy (0.999 — nearly everything
        # survives, the kept set grows to the cluster size and every
        # row GEMMs against it: the operator's worst case, where a
        # quadratic term would surface if the chunked kept-set GEMM
        # were mis-bounded)
        for threshold in (0.9, 0.999):
            dropped = [0]

            def run() -> int:
                out = semantic_dedup(df, threshold=threshold)
                agg = out.agg(
                    F.count("*").alias("n"),
                    F.sum((~F.col("keep")).cast("long")).alias("d"),
                ).head()
                dropped[0] = agg["d"]
                return agg["n"]

            w, total = _timed(run)
            print(
                f"| {label} t={threshold} | {n_clusters} | {w:.2f} s "
                f"| {dropped[0]:,}/{total:,} |"
            )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
