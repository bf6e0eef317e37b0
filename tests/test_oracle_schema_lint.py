"""Canonicalizability lint for the driver-visible oracle window.

The driver's CORRECTNESS harness canonicalizes both engines' results with
pandas ``sort_values``, which factorizes every cell — an array / map /
struct column throws ``TypeError: unhashable type`` and kills the row
before any comparison happens (the round-7 ``bpe_encode_docs`` failure).
This lint asserts, at plan time, that every oracle-carrying registry
entry returns ATOMIC-typed columns only, so that failure class cannot
reach the driver again. Entries without an oracle (rows-only checks) may
return arrays; the driver only counts their rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from go_vectorsearch_spark.queries import REGISTRY

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


def _non_atomic_fields(schema: StructType) -> list[str]:
    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if _is_non_atomic(f.dataType)
    ]


def _is_non_atomic(dt: DataType) -> bool:
    return isinstance(dt, (ArrayType, MapType, StructType))


def test_lint_is_red_on_array_output(spark):
    """The lint predicate itself must flag an array-outputting frame —
    guards against the lint rotting into a tautology."""
    df = spark.range(3).select(
        F.col("id"), F.array(F.lit("a"), F.lit("b")).alias("tokens")
    )
    assert _non_atomic_fields(df.schema) == ["tokens: array<string>"]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_entry_schema_is_atomic(spark, sf_smoke, name):
    df = REGISTRY[name].fn(spark, sf_smoke)
    bad = _non_atomic_fields(df.schema)
    assert not bad, (
        f"oracle entry {name} returns non-atomic columns {bad}; the "
        "driver's pandas canonicalizer cannot sort these — flatten "
        "(posexplode) or fingerprint (md5 of a joined string) instead"
    )
