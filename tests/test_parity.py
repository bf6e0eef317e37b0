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
