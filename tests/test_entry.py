"""Smoke tests mirroring the driver's t1 check."""

from __future__ import annotations

import importlib.util
import os

SPEC = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["vec_id", "score"]


def test_registry_consistency():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
