"""Two-decade measurement for the RESHARDED token-budget sampler (r12).

The r11 verdict's one perf-weak flag was this operator's per-stratum
unbounded-preceding window (one task per stratum = a corpus-scale
single-task sort at ~4 language strata). The r12 two-level prefix sum
(range-sharded hash order, one reused exchange, broadcast shard offsets)
is bit-identical by construction — this tool measures that the FIX also
scales: 5k / 50k / 500k documents of the distinct-copies corpus, budgets
scaled with the corpus so the selected set stays a constant fraction
(what a production mix does). Protocol: idle host, warm session, median
of 3 after one cold (the bench.py convention).

Usage: python tools/decade_budget.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark import queries as Q  # noqa: E402
from go_vectorsearch_spark.operators.curation import (  # noqa: E402
    token_budget_sample,
)
from go_vectorsearch_spark.sources.tables import load_table  # noqa: E402
from tools.decade_dedup import _copies, _timed  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decade_budget"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("decade-budget")
    docs = load_table(spark, sf_dir, "documents")

    def corpus(n_copies: int, parts: int, dest: str) -> None:
        if n_copies == 1:
            c = docs.select("doc_id", "text", "lang")
        else:
            c = _copies(docs.select("doc_id", "text"), n_copies, distinct=True)
            c = c.withColumn("src_id", c.doc_id % 10_000_000).join(
                docs.selectExpr("doc_id AS src_id", "lang"), "src_id"
            ).select("doc_id", "text", "lang")
        os.makedirs(dest)
        c.repartition(parts).write.parquet(f"{dest}/documents.parquet")

    corpus(1, 8, f"{work}/base")
    corpus(10, 32, f"{work}/x10")
    corpus(100, 64, f"{work}/x100")

    print("\n| corpus | token_budget_sample wall | selected |")
    print("|---|---|---|")
    for label, d, mult in (
        ("base (sf0.1, 5k)", "base", 1),
        ("10x (50k)", "x10", 10),
        ("100x (500k, ~sf10)", "x100", 100),
    ):
        df = spark.read.parquet(f"{work}/{d}/documents.parquet")
        budgets = {k: v * mult for k, v in Q._CURATE_BUDGETS.items()}
        w, n = _timed(
            lambda: token_budget_sample(
                df, "lang", budgets,
                default_budget=Q._CURATE_DEFAULT_BUDGET * mult,
            ).count()
        )
        print(f"| {label} | {w:.2f} s | {n:,} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
