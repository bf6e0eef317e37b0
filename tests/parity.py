"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same sf dir, then compares row count, column names, and an
order-insensitive value multiset (floats rounded to 5 decimals before
comparison, one decimal looser than the 6-decimal rounding the queries
themselves apply, so last-bit differences can't flip the check).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from go_vectorsearch_spark.sources.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 5)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Rich local canonicalization (tuple-izes lists so they sort) — used
    by the DEMOTED parity tests, which the driver never runs and whose
    results may legitimately carry array cells."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _norm_scalar(v: Any) -> Any:
    """Float rounding / NaN pinning only — lists pass through RAW so the
    driver-faithful sort below throws on them, exactly like the driver."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 5)
    return v


def _canon_driver(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Driver-faithful canonicalization: columns sorted by name, then a
    pandas ``sort_values`` over all columns — the same code path the
    driver's oracle harness uses. Non-atomic cells (lists/dicts) raise
    ``TypeError: unhashable type`` HERE at sf0.01, instead of silently
    passing locally and erroring only in the driver's CORRECTNESS run
    (the r7 ``bpe_encode_docs`` failure mode)."""
    import pandas as pd

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = [tuple(_norm_scalar(r[i]) for i in order) for r in rows]
    pdf = pd.DataFrame(data, columns=names)
    if len(pdf):
        pdf = pdf.sort_values(by=names, kind="mergesort")
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def compare(spark, sf_dir: str, name: str) -> None:
    """Assert Spark result == DuckDB oracle result for query `name`."""
    from go_vectorsearch_spark.queries import REGISTRY

    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} has no oracle"
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(spec.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _canon_driver(s_cols, s_rows), _canon_driver(d_cols, d_rows)
    mismatches = [
        (a, b)
        for a, b in zip(sn, dn)
        if not all(_cells_equal(x, y) for x, y in zip(a, b))
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"


def _cells_equal(x: Any, y: Any) -> bool:
    """Tuple-cell equality with NaN == NaN (pandas coerces a None in a
    float column to NaN at DataFrame construction — after the per-cell
    normalization ran — and nan != nan would flag identical rows)."""
    if (
        isinstance(x, float)
        and isinstance(y, float)
        and math.isnan(x)
        and math.isnan(y)
    ):
        return True
    return x == y
