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
#: left_anti IS safe: a fact row with salt s is anti-retained iff no dim
#: row matches (k, s), and the dim side carries EVERY salt for every key
#: — equivalent to "k not in dim", identical to the unsalted anti join.
SALTABLE_JOINS = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "left_anti", "leftanti"}
)


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
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("__salt")
    dim_salted = dim.select(F.col("*"), salts)
    fact_salted = skewed.withColumn(
        "__salt", content_salt(skewed, num_salts, salt_cols)
    )
    return fact_salted.join(dim_salted, [key, "__salt"], how).drop("__salt")


def _contains_map(dt) -> bool:
    """True if the datatype contains a MapType at ANY nesting level —
    xxhash64 rejects maps wherever they appear (a top-level typeName()
    check misses array<map<...>> / struct fields)."""
    name = dt.typeName()
    if name == "map":
        return True
    if name == "array":
        return _contains_map(dt.elementType)
    if name == "struct":
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def content_salt(
    df: DataFrame, num_salts: int, salt_cols: tuple[str, ...] | None = None
) -> Column:
    """The salt expression :func:`salted_join` applies to the fact side
    — exposed so tests and callers derive salts through the SAME code
    path as the join (a re-implemented copy can silently drift)."""
    if salt_cols is None:
        hashable = [f.name for f in df.schema.fields if not _contains_map(f.dataType)]
        if not hashable:
            raise ValueError("salted_join: no hashable columns to derive a salt from")
        salt_cols = tuple(hashable)
    return F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(num_salts)).cast("int")


def hot_block_profile(
    df: DataFrame, key_sets: tuple[tuple[str, ...], ...], threshold: int
) -> DataFrame:
    """Blocks at or above ``threshold`` rows, for one or MANY block-key
    sets in a single map-side-combined corpus pass (grouping sets) —
    the skew-detection operator behind the blocked-self-join guard
    (queries/entity.py profiles both affix keys through this).

    Returns the union of hot (key columns..., __n, __set) rows, where
    ``__set`` is the index into ``key_sets`` the row belongs to and
    columns outside that set are NULL.  The result is tiny by
    definition (hot keys are rare) and broadcast-joinable back against
    the corpus."""
    if len(key_sets) == 1:
        return (
            df.groupBy(*[F.col(c) for c in key_sets[0]])
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") >= threshold)
            .withColumn("__set", F.lit(0))
        )
    all_cols: list[str] = []
    for ks in key_sets:
        for c in ks:
            if c not in all_cols:
                all_cols.append(c)
    # grouping_id: one bit per groupBy column (first column = most
    # significant), set when the column is aggregated AWAY — so each
    # key set has one known gid, mapped back to its key_sets index
    gid_of = {
        sum(1 << (len(all_cols) - 1 - i) for i, c in enumerate(all_cols) if c not in ks): si
        for si, ks in enumerate(key_sets)
    }
    set_idx = F.lit(None).cast("int")
    for gid, si in gid_of.items():
        set_idx = F.when(F.grouping_id() == gid, F.lit(si)).otherwise(set_idx)
    return (
        df.groupingSets([list(ks) for ks in key_sets], *all_cols)
        .agg(F.count(F.lit(1)).alias("__n"), set_idx.alias("__set"))
        .filter(F.col("__n") >= threshold)
    )


def hot_block_keys(df: DataFrame, key_cols: tuple[str, ...], threshold: int) -> DataFrame:
    """Single-key-set convenience form of :func:`hot_block_profile`:
    just the hot key tuples, counts dropped."""
    return hot_block_profile(df, (key_cols,), threshold).drop("__n", "__set")


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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """The co-located-join layout: persist as a BUCKETED (optionally
    sorted) table so equi-joins and aggregations on the bucket key need
    NO exchange at read time — both sides arrive pre-partitioned by the
    same hash, and with sort buckets the sort drops out of sort-merge
    too.  At 100 TB this is the difference between shuffling two fact
    tables per join and shuffling them once at write.

    Spark constraint: bucketing metadata lives in the catalog, so this
    writes via ``saveAsTable`` (a warehouse table, not a bare path).
    Readers use ``spark.table(name)``; the physical plan shows the
    bucket spec and omits Exchange under joins on ``bucket_cols``."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
