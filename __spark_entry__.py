"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``car_etl_spark`` package; this module just
adapts its registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from car_etl_spark.queries import build_registry  # noqa: E402

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2): tenant-concentration rollup —
    scan, join, group-by, broadcast total, top-k, rank + cumulative-share
    windows in one DAG — on /root/testdata/sf0.001."""
    from car_etl_spark.queries.analytics import flagship_portfolio_rollup

    return flagship_portfolio_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _REGISTRY.items()}


#: the driver's documented correctness corpus — callable oracles
#: (corpus-derived artifacts, e.g. the learned-BPE vocabulary twin)
#: are materialized for this dir
DRIVER_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    from car_etl_spark.queries import resolve_oracle

    return {
        name: resolve_oracle(spec.oracle, DRIVER_ORACLE_SF_DIR)
        for name, spec in _REGISTRY.items()
        if spec.oracle is not None
    }
