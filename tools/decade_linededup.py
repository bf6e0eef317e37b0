"""10x decade measurement for the line-dedup family (r11).

The family gained its driver oracle (line_dedup_docs, windowed r11), a
streaming twin and an Engine write path this round; this measures the
corpus-scale batch operator at sf0.1 and 10x. Corpus: the line_dedup
fixture derivation (shared footer keyed by doc_id % 7 → hot everywhere;
unique trailer + original text kept) over the r10 distinct-copies 10x
recipe, so the hot-set size stays constant while the corpus grows 10x —
wall scaling isolated from hot-set scaling, the production shape (a 10x
crawl has 10x pages of the SAME site boilerplate).

Usage: python tools/decade_linededup.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark.operators.curation import (  # noqa: E402
    strip_boilerplate_lines,
)
from go_vectorsearch_spark.queries import _lined_corpus as _lined  # noqa: E402
from go_vectorsearch_spark.sources.tables import load_table  # noqa: E402
from tools.decade_dedup import _copies, _timed  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decade_linededup"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("decade-linededup")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    _lined(base).write.parquet(f"{work}/base")
    _lined(_copies(base, 10, distinct=True)).repartition(32).write.parquet(
        f"{work}/x10"
    )
    # second decade (r12): 100x = 500k docs ~ sf10 — two chained decades
    # catch a log factor a single 10x step hides in scheduling noise
    _lined(_copies(base, 100, distinct=True)).repartition(64).write.parquet(
        f"{work}/x100"
    )

    rows = []
    for label, p in (
        ("base (sf0.1, 5k)", f"{work}/base"),
        ("10x (50k)", f"{work}/x10"),
        ("100x (500k, ~sf10)", f"{work}/x100"),
    ):
        docs = spark.read.parquet(p)
        w, n = _timed(
            lambda: strip_boilerplate_lines(docs, min_df=10)
            .filter(F.length("text") > 0)
            .count()
        )
        rows.append((label, w, n))
    print("\n| corpus | wall | surviving docs |")
    print("|---|---|---|")
    for label, w, n in rows:
        print(f"| {label} | {w:.2f} s | {n:,} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
