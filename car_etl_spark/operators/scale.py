"""Scale-hardening operators: skew-salted joins and partitioned sinks.

These are the knobs ARCHITECTURE.md §3 reserves for 100 TB operation:

- **Salted join** for when AQE's skew splitting isn't enough (a single
  hot key larger than an executor): explode the build side over N salt
  replicas, salt the probe side randomly-but-deterministically, join on
  (key, salt).  N bounds the hot key's largest partition at 1/N.
- **Partitioned write** with layout contract: facts land partitioned by
  the dominant pruning column (tenant/date), so per-tenant and
  time-range scans read only their partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: join types for which salting preserves exact join semantics.  For
#: right/full the exploded dim side would return each unmatched dim row
#: ``num_salts`` times, so those are rejected rather than silently wrong.
SALTABLE_JOINS = frozenset({"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"})


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
    salt_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Join a skew-heavy fact side to a (small) dimension under salt.

    The dimension is exploded ``num_salts``x (cheap — it is the small
    side); the fact side gets a salt derived purely from row CONTENT
    (xxhash64 over ``salt_cols``, defaulting to every *hashable* fact
    column — map columns are skipped since xxhash64 rejects MapType),
    so a task retry or an AQE repartition re-derives the identical salt
    — never a function of partition layout.

    Limitation: fully-identical rows share a salt, so a hot key made of
    exact duplicate rows stays skewed — the spread comes from payload
    diversity.  Callers with such data should pass ``salt_cols`` naming
    a discriminator (e.g. an event id or offset column) that varies
    across the duplicates.

    Result is identical to the unsalted join for ``how`` in
    :data:`SALTABLE_JOINS`; right/full joins would duplicate unmatched
    dim rows across salt replicas and are rejected.
    """
    if how.replace("_", "").lower() not in {h.replace("_", "") for h in SALTABLE_JOINS}:
        raise ValueError(
            f"salted_join supports {sorted(SALTABLE_JOINS)} only; "
            f"got how={how!r} (right/full would emit unmatched dim rows "
            f"once per salt replica)"
        )
    if salt_cols is None:
        # xxhash64 raises AnalysisException on MapType input; everything
        # else in a fact schema (atomics, arrays, structs) hashes fine.
        hashable = [
            f.name for f in skewed.schema.fields if not f.dataType.typeName() == "map"
        ]
        if not hashable:
            raise ValueError("salted_join: no hashable columns to derive a salt from")
        salt_cols = tuple(hashable)
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("__salt")
    dim_salted = dim.select(F.col("*"), salts)
    fact_salted = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(num_salts)).cast("int"),
    )
    return fact_salted.join(dim_salted, [key, "__salt"], how).drop("__salt")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    mode: str = "overwrite",
) -> None:
    """The fact-table landing contract: parquet partitioned by the
    pruning columns.  Readers filtering on those columns scan only
    matching directories (PartitionFilters in the plan)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def prune_check(spark, path: str, predicate: Column) -> tuple[int, str]:
    """Read back with a partition predicate and return (row_count, plan)
    so callers can assert PartitionFilters engaged."""
    df = spark.read.parquet(path).filter(predicate)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return df.count(), plan
