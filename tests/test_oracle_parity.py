"""Every registered query must match its DuckDB oracle at sf0.001 —
the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from car_etl_spark.oracle import compare
from car_etl_spark.queries import build_registry, resolve_oracle
from tests.conftest import SF_SMALL

REGISTRY = build_registry()
ORACLE_CHECKED = [(n, s) for n, s in sorted(REGISTRY.items()) if s.oracle is not None]


@pytest.mark.parametrize("name,spec", ORACLE_CHECKED, ids=[n for n, _ in ORACLE_CHECKED])
def test_oracle_parity(spark, name, spec):
    result = compare(name, spark, SF_SMALL, spec.fn, resolve_oracle(spec.oracle, SF_SMALL))
    assert result.ok, f"{name}: {result.detail}"
    assert result.spark_rows > 0 or name in ALLOW_EMPTY, f"{name}: empty result"


# every current registry entry must produce rows at sf0.001; the one
# legitimately-empty round-1 query (customers_without_orders) is no
# longer a registry entry
ALLOW_EMPTY: set[str] = set()


def test_registry_has_no_duplicate_functions():
    fns = [spec.fn for spec in REGISTRY.values()]
    assert len(fns) == len(set(fns))
