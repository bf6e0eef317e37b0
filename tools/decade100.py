"""Second measured decade (100x sf0.1 ~ sf10) for the cheapest
corpus-scale paths.

The r10 verdict's task 5: every scale claim in BASELINE.md rests on ONE
measured decade (10x). A second decade catches any O(n log n) or worse
term masquerading as linear across the first (a 10x step hides a log
factor inside scheduling noise; two chained decades do not). Measured
here, at 5k / 50k / 500k documents of DISTINCT copies (the r10 recipe:
copy k perturbs every 3rd token, so cross-copy shingle/window overlap
vanishes and RESULTS grow ~linearly with the corpus, isolating wall
scaling from output scaling):

1. shingle_build  — one scan + split + hash pass (the dedup family's
   shared map cost; purely embarrassing parallelism).
2. dedup_exact_substr stats — window hashes -> duplicate set ->
   gaps-and-islands (the substring family's read side, ONE groupBy over
   corpus-token-sized 16-byte keys; the family's dominant shuffle).
3. minhash_lsh_pairs — signature pass + banded candidate join (the
   production near-dup path at crawl scale).

Protocol: idle host, warm session, median of 3 after one cold; each
corpus pays the shared shingle pass once (persisted, billed as build —
the bench.py convention). The 100x corpus is written once to parquet so
all measurements read the same on-disk layout the smaller rungs use.

Usage: python tools/decade100.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark.operators import dedup as DD  # noqa: E402
from go_vectorsearch_spark.operators import substr as SUB  # noqa: E402
from go_vectorsearch_spark.sources.tables import load_table  # noqa: E402
from tools.decade_dedup import _copies, _timed  # noqa: E402


def measure(spark, path: str, label: str):
    docs = spark.read.parquet(path)
    t0 = time.perf_counter()
    shingled = DD.shingled_docs(docs).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    n_docs = shingled.count()
    build = time.perf_counter() - t0
    rows = [(label, "shingle_build", build, n_docs)]
    try:
        w, n = _timed(
            lambda: DD.minhash_lsh_pairs(
                docs, threshold=0.2, shingled=shingled
            ).count()
        )
        rows.append((label, "minhash_lsh_pairs", w, n))
    finally:
        shingled.unpersist()
    # the stats op builds its own window/flag frames per run — the
    # honest fresh-corpus cost of the substring family's read side
    w, n = _timed(lambda: SUB.exact_substr_stats(docs, L=8).count())
    rows.append((label, "exact_substr_stats (L=8)", w, n))
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decade100"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("decade-100x")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    base.write.parquet(f"{work}/base")
    _copies(base, 10, distinct=True).repartition(32).write.parquet(
        f"{work}/x10"
    )
    _copies(base, 100, distinct=True).repartition(64).write.parquet(
        f"{work}/x100"
    )

    all_rows = []
    all_rows += measure(spark, f"{work}/base", "base (sf0.1, 5k)")
    all_rows += measure(spark, f"{work}/x10", "10x (50k)")
    all_rows += measure(spark, f"{work}/x100", "100x (500k, ~sf10)")

    print("\n| corpus | entry | wall | result rows |")
    print("|---|---|---|---|")
    for label, entry, wall, n in all_rows:
        print(f"| {label} | {entry} | {wall:.2f} s | {n:,} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
