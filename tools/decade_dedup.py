"""sf1 decade measurement for the text near-dup pair family.

The r9 verdict's task 3: BASELINE.md carries measured decades for the
band store, PCA, and the cut write paths — not for jaccard_pairs /
minhash_lsh_pairs / simhash_pairs at 10x corpus, and the hot-shingle
frequency cap's skew protection was asserted, never measured. This
script measures both:

1. DECADE: the three pair operators at sf0.1 (~5k docs) and at a 10x
   corpus of DISTINCT copies (copy k perturbs every 3rd token, so
   cross-copy shingle overlap vanishes and the RESULT grows ~10x, not
   ~100x — isolating wall scaling from output scaling; the r6 decade
   already recorded the replicated-copy output explosion for minhash).
2. HOT-SHINGLE CAP: a corpus where EVERY document ends with the same
   8-token boilerplate (each boilerplate 3-gram shared by all N docs).
   Uncapped, each hot shingle feeds f^2/2 rows through one join key —
   measured at base scale; capped (the production default,
   max_shingle_freq=1000) at base AND 10x, where the cap must keep the
   wall flat-ish because the hot keys are dropped before the join.

Each corpus pays its shared shingle pass once (persisted, billed as
"build" like bench.py). Timings: median of 3 warm runs after one cold.

Usage: python tools/decade_dedup.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark.operators import dedup as DD  # noqa: E402
from go_vectorsearch_spark.sources.tables import load_table  # noqa: E402

BOILER = "this boilerplate footer sentence appears at the end of every document"


def _copies(docs, n_copies: int, distinct: bool):
    """Union of n_copies id-shifted copies; ``distinct`` perturbs every
    3rd token per copy (kills cross-copy shingles), else appends a
    per-copy suffix token (the r6 near-dup-heavy recipe)."""
    legs = []
    for k in range(n_copies):
        leg = docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"), "text"
        )
        if k > 0:
            if distinct:
                toks = F.split(F.trim(F.col("text")), r"\s+")
                mangled = F.transform(
                    toks,
                    lambda t, i: F.when(
                        i % 3 == 0, F.concat(F.lit(f"c{k}x"), i.cast("string"))
                    ).otherwise(t),
                )
                leg = leg.select("doc_id", F.concat_ws(" ", mangled).alias("text"))
            else:
                leg = leg.select(
                    "doc_id", F.concat(F.col("text"), F.lit(f" copysuffix{k}")).alias("text")
                )
        legs.append(leg)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def _timed(fn, runs: int = 3) -> tuple[float, int]:
    n = fn()  # cold (codegen; the shared frame is already materialized)
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        n = fn()
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[runs // 2], n


def measure(spark, path: str, label: str, capped_only: bool = False):
    docs = spark.read.parquet(path)
    t0 = time.perf_counter()
    shingled = DD.shingled_docs(docs).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    n_docs = shingled.count()
    build = time.perf_counter() - t0
    rows = [(label, "shingle_build", build, n_docs)]
    try:
        if not capped_only:
            w, n = _timed(
                lambda: DD.jaccard_pairs(
                    docs, threshold=0.2, max_shingle_freq=None, shingled=shingled
                ).count()
            )
            rows.append((label, "jaccard_pairs (uncapped)", w, n))
        w, n = _timed(
            lambda: DD.jaccard_pairs(
                docs, threshold=0.2, shingled=shingled
            ).count()
        )
        rows.append((label, "jaccard_pairs (capped 1000)", w, n))
        if not capped_only:
            w, n = _timed(
                lambda: DD.minhash_lsh_pairs(
                    docs, threshold=0.2, shingled=shingled
                ).count()
            )
            rows.append((label, "minhash_lsh_pairs", w, n))
            toks = DD.tokenized_docs(docs).persist(
                StorageLevel.MEMORY_AND_DISK_DESER
            )
            toks.count()
            try:
                sims = DD.simhash(docs, tokenized=toks).persist(
                    StorageLevel.MEMORY_AND_DISK_DESER
                )
                sims.count()
                w, n = _timed(
                    lambda: DD.simhash_pairs(docs, sims=sims).count()
                )
                rows.append((label, "simhash_pairs", w, n))
                sims.unpersist()
            finally:
                toks.unpersist()
    finally:
        shingled.unpersist()
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decade_dedup"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("decade-dedup")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    base.write.parquet(f"{work}/base")
    _copies(base, 10, distinct=True).repartition(32).write.parquet(
        f"{work}/distinct10"
    )
    # the boilerplate appends AFTER the per-copy mangling, so it is
    # byte-identical across the WHOLE 10x corpus (freq = 50k >> cap):
    # appending before would mangle it positionally per copy, creating
    # sub-cap same-length-doc footer families that measure genuine
    # near-dup output growth instead of the cap's hot-key protection
    def _with_boiler(df):
        return df.select(
            "doc_id", F.concat(F.col("text"), F.lit(" " + BOILER)).alias("text")
        )

    _with_boiler(base).write.parquet(f"{work}/boiler_base")
    _with_boiler(_copies(base, 10, distinct=True)).repartition(
        32
    ).write.parquet(f"{work}/boiler10")

    all_rows = []
    all_rows += measure(spark, f"{work}/base", "base (sf0.1)")
    all_rows += measure(spark, f"{work}/distinct10", "distinct 10x")
    # hot-shingle corpora: every doc shares the boilerplate shingles
    # (f = corpus size). Uncapped is measured at base scale only — at
    # 10x it would be the f^2 blowup the cap exists to prevent.
    all_rows += measure(spark, f"{work}/boiler_base", "boiler base")
    all_rows += measure(spark, f"{work}/boiler10", "boiler 10x", capped_only=True)

    print("\n| corpus | entry | wall | result rows |")
    print("|---|---|---|---|")
    for label, entry, wall, n in all_rows:
        print(f"| {label} | {entry} | {wall:.2f} s | {n:,} |")


if __name__ == "__main__":
    main()
