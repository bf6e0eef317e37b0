"""Two-decade measurement for the boilerplate-cut FIXPOINT entry (r13).

The r12 verdict's one perf-weak flag: `boilerplate_cut_docs` cost
~5-6 s at sf0.1 against a ~0.4-0.5 s DuckDB twin — the only entry
outside 2x of its own twin — with the gap ATTRIBUTED to the per-action
scheduling floor of the driver-loop fixpoint, but (unlike every other
composed claim in the repo) never priced by a decade row. This tool
prices the ENTRY's own operator chain at 5k / 50k / 500k documents of
the derived cascade corpus (queries._bp_corpus — pass 1 cuts the
corpus-hot footer and freezes footer-only docs, the in-loop storage
normalization period-migrates the staged tail family across min_df,
pass 2 cuts it, pass 3 observes convergence), so the sf0.1 gap is
PROVED fixed-cost (bounded driver-loop actions) rather than a per-pass
term that grows with the corpus. What runs here is the r13 fused pass:
one action per pass (the materializing changed-count IS the
convergence probe), no per-pass done holds, marker passed in.

Protocol: idle host, warm session, median of 3 after one cold; the
derived cascade corpus persists once per rung and is billed as build
(the entry's _dedup_cached session-cache convention).

Usage: python tools/decade_boilerplate.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark import queries as Q  # noqa: E402
from go_vectorsearch_spark.operators import curation as CUR  # noqa: E402
from go_vectorsearch_spark.operators.documents import (  # noqa: E402
    EMPTY_DOC_MARKER,
    format_multiline_text,
)
from go_vectorsearch_spark.sources.tables import load_table  # noqa: E402
from tools.decade_dedup import _copies, _timed  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decade_boilerplate"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("decade-boilerplate")
    docs = load_table(spark, sf_dir, "documents")

    def corpus(n_copies: int, parts: int, dest: str) -> None:
        # distinct copies: the perturbation changes md5(text), so every
        # copy's body line stays unique (df=1) and the cascade's pass-3
        # convergence holds at every rung; the id shift preserves the
        # % 50 footer-only stripe and the div-12 tail buckets
        c = (
            docs.select("doc_id", "text")
            if n_copies == 1
            else _copies(docs.select("doc_id", "text"), n_copies, distinct=True)
        )
        os.makedirs(dest)
        c.repartition(parts).write.parquet(f"{dest}/documents.parquet")

    corpus(1, 8, f"{work}/base")
    corpus(10, 32, f"{work}/x10")
    corpus(100, 64, f"{work}/x100")

    def duckdb_twin(d: str) -> float:
        """The entry's own DuckDB twin (BOILERPLATE_CUT_ORACLE derives
        the cascade corpus from the documents view itself) against the
        SAME rung parquet — prices how the single-statement unroll
        grows with the corpus next to the fixed-cost driver loop."""
        import time as _time

        import duckdb

        con = duckdb.connect()
        try:
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{work}/{d}/documents.parquet/*.parquet')"
            )
            t0 = _time.perf_counter()
            con.execute(Q.BOILERPLATE_CUT_ORACLE).arrow()
            return _time.perf_counter() - t0
        finally:
            con.close()

    print("\n| corpus | boilerplate_cut fixpoint wall | DuckDB twin | docs out | markers |")
    print("|---|---|---|---|---|")
    for label, d in (
        ("base (sf0.1, 5k)", "base"),
        ("10x (50k)", "x10"),
        ("100x (500k, ~sf10)", "x100"),
    ):
        raw = spark.read.parquet(f"{work}/{d}/documents.parquet")
        derived = Q._bp_corpus(raw).persist(StorageLevel.MEMORY_AND_DISK_DESER)
        derived.count()  # build: the entry session-caches this frame

        markers = [0]

        def run() -> int:
            out = CUR.strip_boilerplate_fixpoint(
                derived,
                min_df=Q._BP_MIN_DF,
                iterate=3,
                normalize=format_multiline_text,
                marker=EMPTY_DOC_MARKER,
            )
            n = out.count()
            markers[0] = out.filter(
                out["text"] == EMPTY_DOC_MARKER
            ).count()
            out.unpersist()
            return n

        w, n = _timed(run)
        tw = duckdb_twin(d)
        print(f"| {label} | {w:.2f} s | {tw:.2f} s | {n:,} | {markers[0]:,} |")
        derived.unpersist()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
