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


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-heavy fact side to a (small) dimension under salt.

    The dimension is exploded ``num_salts``x (cheap — it is the small
    side); the fact side gets a deterministic pseudo-random salt from
    xxhash64 of its whole row key + a monotonic discriminator, spreading
    a hot key over ``num_salts`` partitions.  Result is identical to the
    unsalted join.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("__salt")
    dim_salted = dim.select(F.col("*"), salts)
    fact_salted = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(num_salts)).cast(
            "int"
        ),
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
