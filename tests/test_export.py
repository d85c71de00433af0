"""Deterministic training-shard export contracts."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from car_etl_spark.operators.export import (
    read_training_shard,
    write_training_shards,
)


def _corpus(spark, n=2000, sources=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % sources).cast("string")).alias("source"),
        F.concat(F.lit("text of document "), F.col("id").cast("string")).alias("text"),
    )


def test_shards_partition_every_row_exactly_once(spark, tmp_path):
    docs = _corpus(spark)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, num_shards=8)
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert back.select("doc_id").distinct().count() == 2000
    assert back.select("shard").distinct().count() == 8
    # balance: uniform hash sharding keeps shards within ~2x of each other
    counts = [r["count"] for r in back.groupBy("shard").count().collect()]
    assert max(counts) <= 2 * min(counts), counts


def test_export_is_deterministic_across_reruns(spark, tmp_path):
    """Same input -> identical shard membership AND identical physical
    row order inside every shard file (read back WITHOUT sorting)."""
    docs = _corpus(spark)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, p1, num_shards=4)
    write_training_shards(docs, p2, num_shards=4)
    for shard in range(4):
        f1 = sorted((tmp_path / "a" / f"shard={shard}").glob("*.parquet"))
        f2 = sorted((tmp_path / "b" / f"shard={shard}").glob("*.parquet"))
        ids1 = [i for f in f1 for i in pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()]
        ids2 = [i for f in f2 for i in pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()]
        assert ids1 == ids2 and len(ids1) > 0  # membership AND order


def test_shard_order_interleaves_sources(spark, tmp_path):
    """The pseudo-shuffle must break source runs: in hash order, the
    chance of 12 consecutive same-source rows (4 sources) is ~4^-11 per
    position — a run that long means the shuffle is broken."""
    docs = _corpus(spark)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, num_shards=2)
    rows = read_training_shard(spark, path, shard=0).select("source").collect()
    longest, run = 1, 1
    for prev, cur in zip(rows, rows[1:]):
        run = run + 1 if cur.source == prev.source else 1
        longest = max(longest, run)
    assert longest < 12, f"source run of {longest} — not shuffled"


def test_single_shard_read_prunes_to_directory(spark, tmp_path):
    docs = _corpus(spark)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, num_shards=8)
    one = read_training_shard(spark, path, shard=3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert pf and "shard" in pf[0], plan[:2000]
    # and the shard holds exactly the rows whose hash maps to 3
    from car_etl_spark.operators.export import shard_col

    expect = docs.filter(shard_col(F.col("doc_id"), 8) == 3).count()
    assert one.count() == expect > 0


def test_sampled_mix_exports_deterministically(spark, tmp_path):
    """End-to-end mix -> export: the deterministic stratified sample
    (queries/mix.sample_hash) lands as shards, and re-running the whole
    pipeline reproduces the identical shard contents — the reproducible-
    ablation contract (same subset, same order, every run)."""
    from car_etl_spark.queries.mix import sample_hash, source_rate

    docs = _corpus(spark)
    sampled = docs.filter(
        sample_hash(F.col("doc_id")) < (source_rate() * 4294967296).cast("long")
    )
    p1, p2 = str(tmp_path / "m1"), str(tmp_path / "m2")
    write_training_shards(sampled, p1, num_shards=4)
    write_training_shards(sampled, p2, num_shards=4)
    b1, b2 = spark.read.parquet(p1), spark.read.parquet(p2)
    assert b1.count() == b2.count() > 0
    assert b1.exceptAll(b2).count() == 0
    # mixing rates survive the export (src0 rate 1.0 vs src2 rate 0.25)
    per_src = {r.source: r["count"] for r in b1.groupBy("source").count().collect()}
    assert per_src["src0"] == 500  # rate 1.0 keeps every doc
    assert 0 < per_src["src2"] < per_src["src0"] / 2  # rate 0.25 thins


def test_shard_assignment_recomputable_in_duckdb(spark, tmp_path):
    """The shard id derives from the PORTABLE hash, so an auditor can
    recompute every row's shard outside Spark — pinned against DuckDB."""
    import duckdb

    docs = _corpus(spark, n=300)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, num_shards=8)
    got = {
        (r.doc_id, r.shard)
        for r in spark.read.parquet(path).select("doc_id", "shard").collect()
    }
    want = {
        tuple(r)
        for r in duckdb.connect()
        .execute(
            "SELECT doc_id, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 "
            f"FROM read_parquet('{path}/*/*.parquet', hive_partitioning=false)"
        )
        .fetchall()
    }
    assert got == want and len(got) == 300


def test_export_refuses_reserved_columns(spark, tmp_path):
    import pytest

    docs = _corpus(spark).withColumn("shard", F.lit(1))
    with pytest.raises(ValueError, match="shard"):
        write_training_shards(docs, str(tmp_path / "x"), num_shards=4)


def _tenant_corpus(spark, n=1500, tenants=3):
    return _corpus(spark, n).withColumn(
        "tenant_id", F.concat(F.lit("t"), (F.col("doc_id") % 3).cast("string"))
    )


def test_tenant_export_layout_manifest_and_isolation(spark, tmp_path):
    """Tenant-partitioned export: <tenant>/<shard> directory layout,
    per-tenant manifest counts, reads require tenant scope, and one
    tenant's shard assignment is a pure function of its OWN rows —
    re-exporting with another tenant's corpus changed reproduces it
    byte-identically."""
    import pytest

    path = str(tmp_path / "tex")
    df = _tenant_corpus(spark)
    manifest = write_training_shards(df, path, 4, tenant_col="tenant_id")
    # layout: tenant dirs leading, shard dirs inside
    assert (tmp_path / "tex" / "tenant_id=t0" / "shard=0").is_dir()
    # manifest: tenant x shard grain, counts match the written rows
    assert set(manifest) == {"t0", "t1", "t2"}
    for t, shards in manifest.items():
        assert set(shards) == {0, 1, 2, 3}
        n = spark.read.parquet(path).filter(F.col("tenant_id") == t).count()
        assert sum(shards.values()) == n
    # unscoped read of a tenant-partitioned export refuses
    with pytest.raises(ValueError, match="require tenant="):
        read_training_shard(spark, path, tenant_col="tenant_id")
    # scoped read prunes to the tenant and keeps deterministic order
    t0 = read_training_shard(spark, path, shard=2, tenant_col="tenant_id", tenant="t0")
    rows = t0.select("doc_id").collect()
    assert rows and all(r.doc_id % 3 == 0 for r in rows)
    # isolation: drop tenant t2 entirely and re-export — t0's shard
    # files are byte-identical (assignment hashed on (tenant, key))
    path2 = str(tmp_path / "tex2")
    write_training_shards(
        df.filter(F.col("tenant_id") != "t2"), path2, 4, tenant_col="tenant_id"
    )
    a = read_training_shard(
        spark, path, tenant_col="tenant_id", tenant="t0"
    ).select("doc_id", "shard", "__order").collect()
    b = read_training_shard(
        spark, path2, tenant_col="tenant_id", tenant="t0"
    ).select("doc_id", "shard", "__order").collect()
    assert a == b


def test_append_export_manifest_counts_only_this_run(spark, tmp_path):
    """Under mode="append" the manifest must report THIS export's rows,
    not the accumulated root (the manifest is counted from the staged
    frame, never a re-read of the path)."""
    path = str(tmp_path / "texa")
    df = _tenant_corpus(spark)
    m1 = write_training_shards(df, path, 4, tenant_col="tenant_id")
    m2 = write_training_shards(df, path, 4, tenant_col="tenant_id", mode="append")
    # identical input -> identical per-run manifest, even though the
    # root now holds twice the rows
    assert m2 == m1
    total = spark.read.parquet(path).count()
    assert total == 2 * sum(n for sh in m1.values() for n in sh.values())


# ---------------------------------------------------------------------------
# Scale-derived shard count (r12)


def test_derive_num_shards_two_corpus_sizes():
    from car_etl_spark.operators.export import (
        MAX_SHARDS,
        MIN_SHARDS,
        TARGET_TOKENS_PER_SHARD,
        derive_num_shards,
    )

    # correctness/bench scales sit on the floor (layout unchanged)
    assert derive_num_shards(30_000) == MIN_SHARDS == 4
    # a 10^9-token corpus needs 16 shards (ceil(1e9/64Mi)=15 -> pow2)
    assert derive_num_shards(1_000_000_000) == 16
    # growth is monotone power-of-two and caps for exabyte estimates
    assert derive_num_shards(100 * TARGET_TOKENS_PER_SHARD) == 128
    assert derive_num_shards(10**14) == MAX_SHARDS
    # unknown/degenerate estimates resolve to the floor, never crash
    assert derive_num_shards(0) == MIN_SHARDS
    assert derive_num_shards(-1) == MIN_SHARDS


def test_pack_shard_count_footer_derivation():
    from car_etl_spark.queries.mix import pack_shard_count

    # both synthetic corpora sit under one shard's token budget -> the
    # 4-shard floor, so every recorded oracle/bench layout is unchanged
    assert pack_shard_count("/root/testdata/sf0.001") == 4
    assert pack_shard_count("/root/testdata/sf0.01") == 4


def test_estimated_df_tokens_sums_leaves_under_join(spark, tmp_path):
    """A joined plan's estimate is the SUM of its leaf-relation sizes —
    regression: root plan stats without CBO report a join's sizeInBytes
    as the PRODUCT of its children (two 1 GB inputs ~ 10^18 bytes),
    silently deriving the 65536-shard cap for a ~2 GB export."""
    from car_etl_spark.operators.export import derive_num_shards, estimated_df_tokens

    docs = _corpus(spark, n=500)
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    docs.write.parquet(a_path)
    docs.selectExpr("doc_id", "text AS label_text").write.parquet(b_path)
    da, db = spark.read.parquet(a_path), spark.read.parquet(b_path)

    est_a, est_b = estimated_df_tokens(da), estimated_df_tokens(db)
    assert est_a > 0 and est_b > 0
    est_join = estimated_df_tokens(da.join(db, "doc_id"))
    # leaf sum exactly — never multiplicative, never the unknown sentinel
    assert est_join == est_a + est_b
    assert derive_num_shards(est_join) == 4


def test_write_training_shards_derives_when_none(spark, tmp_path):
    from car_etl_spark.operators.export import derive_num_shards, estimated_df_tokens

    docs = _corpus(spark, n=500)
    # persist so the plan's stats come from real file sizes (the 100 TB
    # shape: exports read curated parquet, not local relations)
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    staged = spark.read.parquet(src)
    est = estimated_df_tokens(staged)
    assert est > 0 and derive_num_shards(est) == 4

    p_auto = str(tmp_path / "auto")
    p_explicit = str(tmp_path / "explicit")
    write_training_shards(staged, p_auto, num_shards=None)
    write_training_shards(staged, p_explicit, num_shards=4)
    a = spark.read.parquet(p_auto).orderBy("shard", "__order", "doc_id").collect()
    b = spark.read.parquet(p_explicit).orderBy("shard", "__order", "doc_id").collect()
    assert a == b
