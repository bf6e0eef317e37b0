"""10x decade measurement for the composed curation pipeline
(pipeline_curate_docs, windowed r11).

Each stage has its own decade evidence already (line dedup joins on
16-byte hashes, the substring/decontamination cuts were measured r9, the
pair family r10, token budget is one partitioned window); this measures
the COMPOSITION — the thing a real 100 TB curation job runs — at sf0.1
and at a 10x distinct-copies corpus (the r10 recipe: copy k perturbs
every 3rd token, so near-dup structure and window-duplicate density stay
~constant per document while the corpus grows 10x).

The registry entry reads `documents` from an sf dir, so each corpus is
written as a one-table sf-dir-shaped directory and the REGISTRY function
itself is timed (cold plan per run includes the fixpoint's internal
convergence job; median of 3 after one cold — the bench.py protocol).

Usage: python tools/decade_curate.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark import queries as R  # noqa: E402
from go_vectorsearch_spark.sources.tables import load_table  # noqa: E402
from tools.decade_dedup import _copies, _timed  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decade_curate"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("decade-curate")
    docs = load_table(spark, sf_dir, "documents")

    # sf-dir-shaped corpora: documents.parquet with the full schema (the
    # pipeline reads text + lang; the 10x copies inherit lang by joining
    # the shifted ids back to their source doc's row)
    os.makedirs(f"{work}/base")
    docs.write.parquet(f"{work}/base/documents.parquet")
    def corpus(n_copies: int, parts: int, dest: str) -> None:
        c = _copies(docs.select("doc_id", "text"), n_copies, distinct=True)
        c = c.withColumn(
            "src_id", c.doc_id % 10_000_000
        ).join(
            docs.selectExpr("doc_id AS src_id", "lang", "n_chars"), "src_id"
        ).select("doc_id", "text", "lang", "n_chars")
        os.makedirs(dest)
        c.repartition(parts).write.parquet(f"{dest}/documents.parquet")

    corpus(10, 32, f"{work}/x10")
    # second decade (r12): the composition's 10x ratio was the repo's
    # highest first-decade number (4.5x, r11) — the 50k -> 500k step
    # shows whether a super-linear term hides in the six-stage chain
    corpus(100, 64, f"{work}/x100")

    fn = R.REGISTRY["pipeline_curate_docs"].fn
    rows = []
    for label, d, runs in (
        ("base (sf0.1, 5k)", f"{work}/base", 3),
        ("10x (50k)", f"{work}/x10", 3),
        # the ~sf10 rung runs the full six-stage chain minutes per pass:
        # one timed run after the cold (the decade100 protocol relaxed
        # one notch; noted in BASELINE.md)
        ("100x (500k, ~sf10)", f"{work}/x100", 1),
    ):
        w, n = _timed(lambda: fn(spark, d).count(), runs=runs)
        rows.append((label, w, n))
    print("\n| corpus | wall | result rows (lang strata) |")
    print("|---|---|---|")
    for label, w, n in rows:
        print(f"| {label} | {w:.2f} s | {n} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
