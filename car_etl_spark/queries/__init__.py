"""Oracle-checked query registry — the driver contract surface.

Each entry pairs a Spark DataFrame program with (where expressible) an
equivalent ANSI-SQL string the driver runs through DuckDB over the same
parquet tables.  Parity conventions that make order-insensitive
value-hash comparison robust across engines:

- every computed column is explicitly aliased, identically on both sides;
- every double output is ``round()``-ed (2 dp for money, 4-6 dp for
  ratios) on both sides, so accumulation-order float noise cannot flip
  the hash;
- temporal outputs are formatted to ISO strings on both sides;
- every LIMIT carries a total deterministic ORDER BY (score, then key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One registered query: Spark program + optional DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


def build_registry() -> dict[str, QuerySpec]:
    from car_etl_spark.queries import (
        analytics,
        confidenceq,
        dedup,
        eav,
        entity,
        eventsq,
        extraction,
        fts,
        misc,
        normalize,
        rag,
        relational,
        search,
        textops,
        vector,
    )

    registry: dict[str, QuerySpec] = {}
    for mod in (relational, analytics, normalize, entity, textops, vector, eventsq, search, dedup, eav, rag, confidenceq, misc, fts, extraction):
        for name, spec in mod.QUERIES.items():
            if name in registry:
                raise ValueError(f"duplicate query name: {name}")
            registry[name] = spec
    return registry
