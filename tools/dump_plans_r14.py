"""Dump explain('formatted') for a list of registry entries.

Usage: python tools/dump_plans_r14.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each entry. Mirrors
tools/gen_plans.py's conventions: sf0.01, and the adaptive driver-local
fixpoint gate disabled so the captured shape is the DISTRIBUTED one a
100 TB corpus runs. Entries whose function collects internally and
returns a local relation (the recall sweeps) still dump — their file
shows the local-relation tail; job-count instrumentation is the
evidence for those.

Special pseudo-entries (helpers the sweep consumes, not registry
names): pq_candidate_frame.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import go_vectorsearch_spark.operators.curation as _CUR

_CUR._bounded_local_rows = lambda *a, **k: None

from go_vectorsearch_spark import get_spark  # noqa: E402
from go_vectorsearch_spark import queries as R  # noqa: E402

SF = "/root/testdata/sf0.01"


def frame_of(spark, name):
    if name == "pq_candidate_frame":
        from go_vectorsearch_spark.plans.pq import pq_candidate_frame

        books, coded = R._pq_cached(spark, SF)
        qvec = R._qvec(spark, SF)
        return pq_candidate_frame(coded, books, qvec, cand_k=50)
    return R.REGISTRY[name].fn(spark, SF)


def main():
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans-r14")
    for name in names:
        df = frame_of(spark, name)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
