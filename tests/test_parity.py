"""Oracle-parity tests: every registered query with an oracle must match
DuckDB at sf0.01 - the local version of the driver's t2 gate."""

from __future__ import annotations

import pytest

from go_vectorsearch_spark.queries import REGISTRY
from tests.parity import compare

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_correct, name):
    compare(spark, sf_correct, name)


def test_dedup_semantic_twin_deterministic_multithreaded(sf_correct):
    """The dedup_semantic twin's recursive CTE must be stable under
    DuckDB's default multithreading: its first formulation used a
    LATERAL probe inside the recursive term, which DuckDB 1.0 computes
    NONDETERMINISTICALLY (different drop sets run-to-run, correct only
    at threads=1 — found while building the twin). The shipped
    list-expression formulation keeps the recursion lateral-free; this
    pin re-runs the statement back-to-back on a default (multithreaded)
    connection and requires identical rows, so a regression to any
    thread-sensitive construct fails here by name rather than as a
    flaky driver hash-mismatch."""
    from go_vectorsearch_spark.queries import DEDUP_SEMANTIC_ORACLE
    from tests.parity import duckdb_conn

    con = duckdb_conn(sf_correct)
    try:
        a = sorted(map(tuple, con.execute(DEDUP_SEMANTIC_ORACLE).fetchall()))
        b = sorted(map(tuple, con.execute(DEDUP_SEMANTIC_ORACLE).fetchall()))
    finally:
        con.close()
    assert a == b and len(a) > 0
    dropped = [r for r in a if not r[2]]
    assert dropped, "fixture has no semantic near-dups — twin untested"
