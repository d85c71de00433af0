"""Model-ready training-data export: deterministic shards with a
reproducible global pseudo-shuffle.

The terminal stage of a training-data pipeline (after the mix/dedup/
quality stages in ``queries/mix.py`` and ``queries/dedup.py``): the
curated corpus must land as N fixed shards that (a) every training run
reads IDENTICALLY — shard membership and intra-shard order are pure
functions of the row key, never ``rand()`` or partition scheduling —
and (b) interleave sources, so a sequential reader never sees a long
run of one source (hash order is the classic "global shuffle without a
global sort by random key you can't reproduce").

Plan shape at 100 TB: one ``repartition(num_shards, shard)`` shuffle,
then ``sortWithinPartitions`` (shard LEADS the sort — FileFormatWriter
re-sorts by partition columns otherwise and would silently drop the
intra-shard order), one pass, no driver materialization.  Readers of a
single shard prune to its directory (PartitionFilters).

Reference behavior covered: the reference exports curated document
sets for downstream consumption (``src/documents/export.py``); this is
the distributed, reproducible form of that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_etl_spark.operators.portable import h0

#: suffix for the intra-shard order hash — a DIFFERENT hash input than
#: the shard assignment, so order within a shard is independent of the
#: assignment (reusing one hash would sort each shard by the same value
#: that chose it, i.e. a constant residue class — not a shuffle).
ORDER_SUFFIX = "|order"


def shard_col(key, num_shards: int):
    """Deterministic shard id for a row key column — built on the
    PORTABLE 60-bit hash (md5 of the key's string form), so shard
    membership is recomputable in any engine with md5:
    ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT % n``
    in DuckDB gives the identical assignment (pinned in tests)."""
    return F.pmod(h0(key.cast("string")), F.lit(num_shards)).cast("int")


def order_col(key):
    """Deterministic intra-shard order key (independent of shard_col,
    same portable-hash construction)."""
    return h0(F.concat(key.cast("string"), F.lit(ORDER_SUFFIX)))


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    key_col: str = "doc_id",
    mode: str = "overwrite",
    tenant_col: str | None = None,
) -> dict | None:
    """Land ``df`` as ``shard=<i>/`` parquet directories with a
    reproducible global pseudo-shuffle.

    Every row appears in exactly one shard; re-running on the same
    input reproduces identical shard membership AND identical row order
    inside each file (the written ``__order`` column is the proof key —
    readers that need the order sort by it, readers that don't ignore
    it).

    MULTI-TENANT form (``tenant_col``): the layout becomes
    ``<tenant>=<t>/shard=<i>/`` — each tenant owns its own complete
    shard set (a tenant's training run reads ONLY its directories, the
    reference's RLS discipline, ``020_documents.sql:51-60``), shard
    membership hashes (tenant, key) so one tenant's assignment is
    independent of any other's corpus, and the return value is a
    per-tenant EXPORT MANIFEST ``{tenant: {shard: n_rows}}`` (computed
    at tenant x shard grain — control-plane size) that consumers pin in
    their run configs.  Tenant-blind export returns None."""
    clash = {"shard", "__order"} & set(df.columns)
    if clash:
        raise ValueError(
            f"write_training_shards would overwrite input column(s) {sorted(clash)}; "
            "rename them before exporting"
        )
    shard_key = (
        F.concat(F.col(tenant_col).cast("string"), F.lit("|"), F.col(key_col).cast("string"))
        if tenant_col
        else F.col(key_col)
    )
    staged = df.withColumn("shard", shard_col(shard_key, num_shards)).withColumn(
        "__order", order_col(shard_key)
    )
    if tenant_col:
        # the manifest must count EXACTLY the rows this write lands: a
        # lazy localCheckpoint materializes staged once (the write is
        # the first action, so no extra pass) and the count below reads
        # the same blocks — immune to nondeterministic upstream lineage
        # (a sampled or rand-salted df would otherwise recompute a
        # DIFFERENT row set for the count) and never re-executes the
        # full pipeline for bookkeeping
        staged = staged.localCheckpoint(eager=False)
    pcols = ([tenant_col] if tenant_col else []) + ["shard"]
    (
        # 4x the partitions, still keyed on the layout columns: every
        # (tenant,) shard value hashes to exactly ONE partition (layout
        # and determinism keep), but ids no longer collide
        # balls-in-bins into the same task — repartition(n, shard) left
        # ~1/3 of n tasks empty and the busiest carrying 3-4 shards
        staged.repartition(num_shards * 4, *pcols)
        # partition cols must LEAD the sort: FileFormatWriter re-sorts
        # rows by the partition columns before writing, and only a sort
        # that already leads with them survives into the files.
        # key_col breaks __order-collision ties (a duplicate key, or a
        # 60-bit collision at 10^10 docs, would otherwise order by
        # shuffle arrival — nondeterministic across reruns)
        .sortWithinPartitions(*pcols, "__order", key_col)
        .write.mode(mode)
        .partitionBy(*pcols)
        .parquet(path)
    )
    if not tenant_col:
        return None
    # manifest counts come from THIS export's staged frame (the
    # checkpointed blocks the write itself consumed), not a re-read of
    # the root: under mode="append" the root also holds earlier
    # exports' rows, and a manifest that counted them would misreport
    # this run to consumers pinning it
    counts = (
        staged.groupBy(tenant_col, "shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    manifest: dict = {}
    for r in counts:
        manifest.setdefault(str(r[tenant_col]), {})[int(r["shard"])] = int(r["n"])
    return manifest


def read_training_shard(
    spark: SparkSession,
    path: str,
    shard: int | None = None,
    key_col: str = "doc_id",
    tenant_col: str | None = None,
    tenant=None,
) -> DataFrame:
    """Read back the export — one shard (directory-pruned) or all —
    in the deterministic training order (``key_col`` breaks the rare
    ``__order`` ties, mirroring the write-side sort).  On a
    tenant-partitioned export, ``tenant`` prunes to that tenant's
    directories FIRST (required when ``tenant_col`` is given: an
    unscoped read of a multi-tenant export is a cross-tenant leak)."""
    if tenant_col and tenant is None:
        raise ValueError(
            "tenant-partitioned export: reads require tenant=...; "
            "cross-tenant audits should read the parquet root explicitly"
        )
    df = spark.read.parquet(path)
    if tenant_col:
        df = df.filter(F.col(tenant_col) == tenant)
    if shard is not None:
        df = df.filter(F.col("shard") == shard)
    ties = [key_col] if key_col in df.columns else []
    return df.orderBy("shard", "__order", *ties)
