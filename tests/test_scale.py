"""Scale-hardening tests: salted-join equivalence under extreme skew,
and partition-pruned reads after a partitioned write."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from car_etl_spark.operators import scale as S
from car_etl_spark.tables import load_tables
from tests.conftest import SF_SMALL


def test_salted_join_equivalence(spark):
    """90% of fact rows share one hot key; the salted join must return
    exactly the plain join's result."""
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val"))
    plain = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("sp"), F.sum("dim_val").alias("sd")
    ).collect()[0]
    salted = S.salted_join(fact, dim, "k", num_salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("sp"), F.sum("dim_val").alias("sd")
    ).collect()[0]
    assert plain == salted


def test_salted_join_salt_is_content_derived(spark):
    """The salt must be a pure function of row content: re-deriving it on
    the same rows under a completely different partition layout yields
    identical salts (the task-retry / AQE-repartition safety property)."""
    fact = spark.range(5_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )

    from car_etl_spark.operators.scale import content_salt

    def salts_of(df):
        # derive through the SAME expression salted_join applies — a
        # re-implemented copy here could silently drift from the code
        # under test
        salted = df.withColumn("__salt", content_salt(df, 8))
        return {(r["k"], r["payload"]): r["__salt"] for r in salted.collect()}

    a = salts_of(fact.repartition(32))
    b = salts_of(fact.repartition(3, "payload"))
    assert a == b


def test_salted_join_rejects_right_and_full(spark):
    fact = spark.range(10).select(F.col("id").alias("k"))
    dim = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            S.salted_join(fact, dim, "k", how=how)


def test_salted_left_join_equivalence(spark):
    """Left join: unmatched fact rows survive exactly once."""
    fact = spark.range(100).select((F.col("id") % 20).alias("k"), F.col("id").alias("p"))
    dim = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 3).alias("d"))
    plain = sorted(fact.join(dim, "k", "left").collect())
    salted = sorted(S.salted_join(fact, dim, "k", num_salts=4, how="left").collect())
    assert plain == salted


def test_partitioned_write_prunes(spark):
    events = load_tables(spark, SF_SMALL, ("events",))["events"]
    d = tempfile.mkdtemp(prefix="car-etl-part-")
    try:
        S.write_partitioned(events, d, ("event_type",))
        n, plan = S.prune_check(spark, d, F.col("event_type") == "purchase")
        expected = events.filter(F.col("event_type") == "purchase").count()
        assert n == expected
        assert "PartitionFilters: [isnotnull(event_type" in plan or "event_type#" in plan
        # the pruned read must not touch other partitions' files
        assert "PartitionFilters: []" not in plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Feature-flag broadcast config


def _flag_frames(spark, flags, overrides):
    from car_etl_spark.operators.features import FLAGS_SCHEMA, OVERRIDES_SCHEMA

    return (
        spark.createDataFrame(flags or [], FLAGS_SCHEMA),
        spark.createDataFrame(overrides or [], OVERRIDES_SCHEMA),
    )


def test_feature_flags_override_beats_default_and_fails_closed(spark):
    from car_etl_spark.operators.features import FeatureFlags

    ff = FeatureFlags(
        spark,
        lambda: _flag_frames(
            spark,
            [("new_parser", True), ("dark_mode", False)],
            [("t1", "new_parser", False), ("t2", "dark_mode", True),
             ("t3", "ghost_flag", True)],  # override for a flag not in the catalog
        ),
    )
    assert ff.is_enabled("t9", "new_parser") is True      # default on
    assert ff.is_enabled("t1", "new_parser") is False     # override off beats default
    assert ff.is_enabled("t9", "dark_mode") is False      # default off
    assert ff.is_enabled("t2", "dark_mode") is True       # override on
    assert ff.is_enabled("t3", "ghost_flag") is False     # unknown flag: closed
    assert ff.is_enabled("t9", "missing") is False        # missing flag: closed


def test_feature_flags_ttl_rebroadcast_and_invalidate(spark):
    from car_etl_spark.operators.features import FeatureFlags

    state = {"enabled": False, "loads": 0, "now": 0.0}

    def loader():
        state["loads"] += 1
        return _flag_frames(spark, [("f", state["enabled"])], [])

    ff = FeatureFlags(spark, loader, ttl_seconds=60, clock=lambda: state["now"])
    assert ff.is_enabled("t", "f") is False and state["loads"] == 1
    state["enabled"] = True
    state["now"] = 30.0                     # inside TTL: stale value served, no reload
    assert ff.is_enabled("t", "f") is False and state["loads"] == 1
    state["now"] = 61.0                     # past TTL: reload picks up the change
    assert ff.is_enabled("t", "f") is True and state["loads"] == 2
    state["enabled"] = False
    ff.invalidate()                         # explicit invalidation forces reload now
    assert ff.is_enabled("t", "f") is False and state["loads"] == 3


def test_feature_flags_gate_is_broadcast_join(spark):
    from car_etl_spark.operators.features import FeatureFlags

    ff = FeatureFlags(
        spark,
        lambda: _flag_frames(
            spark, [("beta", False)], [("t1", "beta", True), ("t2", "beta", False)]
        ),
    )
    facts = spark.createDataFrame(
        [("t1", 1), ("t2", 2), ("t3", 3), ("t1", 4)], "tenant_id string, v long"
    )
    gated = ff.gate(facts, "beta")
    assert sorted((r.tenant_id, r.v) for r in gated.collect()) == [("t1", 1), ("t1", 4)]
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # flip the default: un-overridden tenants now pass
    ff2 = FeatureFlags(
        spark,
        lambda: _flag_frames(spark, [("beta", True)], [("t2", "beta", False)]),
    )
    got = sorted((r.tenant_id, r.v) for r in ff2.gate(facts, "beta").collect())
    assert got == [("t1", 1), ("t1", 4), ("t3", 3)]


def test_salted_join_skips_nested_map_columns(spark):
    """MapType at any nesting level must be excluded from the salt hash
    (xxhash64 rejects nested maps too, not just top-level ones)."""
    from car_etl_spark.operators.scale import salted_join

    fact = spark.createDataFrame(
        [(1, [{"a": "b"}], 10), (2, [{"c": "d"}], 20), (1, [{"e": "f"}], 30)],
        "k int, tags array<map<string,string>>, payload int",
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, label string")
    got = sorted(
        (r.k, r.payload, r.label) for r in salted_join(fact, dim, "k", 4).collect()
    )
    assert got == [(1, 10, "x"), (1, 30, "x"), (2, 20, "y")]


def test_feature_flags_gate_tolerates_enabled_column_and_fails_closed(spark):
    from car_etl_spark.operators.features import FeatureFlags

    ff = FeatureFlags(
        spark,
        lambda: _flag_frames(spark, [("beta", False)], [("t1", "beta", True)]),
    )
    facts = spark.createDataFrame(
        [("t1", 1, True), ("t2", 2, False)], "tenant_id string, v long, enabled boolean"
    )
    got = ff.gate(facts, "beta").collect()
    # caller's own `enabled` column survives untouched
    assert [(r.tenant_id, r.v, r.enabled) for r in got] == [("t1", 1, True)]

    def broken_loader():
        raise RuntimeError("control plane down")

    dead = FeatureFlags(spark, broken_loader)
    assert dead.is_enabled("t1", "beta") is False
    assert dead.gate(facts, "beta").count() == 0  # closed, not crashed


def _planted_hot_canon(spark):
    """100 customers whose normalized names differ ONLY in the last two
    chars — one prefix block of 100 rows (the single-hot-key case AQE
    skew splitting cannot fix for a self-join) — plus 60 cold rows in
    distinct blocks."""
    from car_etl_spark.queries.entity import canonical_frame

    hot = [(i, "BUILDING", "hot block name %02d" % i, float(i % 5)) for i in range(100)]
    cold = [
        (1000 + i, "BUILDING", "cold row %02d tail %02d" % (i, i), float(i))
        for i in range(60)
    ]
    cust = spark.createDataFrame(
        hot + cold, "c_custkey long, c_mktsegment string, c_name string, c_acctbal double"
    )
    return canonical_frame(cust)


def test_affix_pairs_salted_equivalence_planted_hot_block(spark):
    """The skew-split plan (hot blocks salted, cold blocks plain) must
    return exactly the unsalted pair set."""
    from car_etl_spark.queries.entity import affix_pairs

    canon = _planted_hot_canon(spark)
    plain = sorted((r.ka, r.kb) for r in affix_pairs(canon).select("ka", "kb").collect())
    salted = sorted(
        (r.ka, r.kb)
        for r in affix_pairs(canon, skew_threshold=50, num_salts=8)
        .select("ka", "kb")
        .collect()
    )
    assert plain == salted
    assert len(plain) >= 100 * 99 // 2  # the hot block's full pair set is present


def test_salted_block_pairs_bound_max_task_input(spark):
    """The salt must actually spread the hot block: (a) content salts
    are near-uniform, so no (block, salt) shuffle group exceeds ~3x the
    uniform share; (b) the pair join's shuffle key INCLUDES __salt, so
    those groups land in different tasks; (c) every pair still appears
    exactly once."""
    from car_etl_spark.operators.scale import content_salt
    from car_etl_spark.queries.entity import _hot_affix_keys, _skew_tagged_pairs

    canon = _planted_hot_canon(spark)
    hot_rows = canon.filter(F.col("name_prefix") == "hot block name ")
    m = hot_rows.count()
    assert m == 100
    per_salt = (
        hot_rows.withColumn("s", content_salt(hot_rows, 8, ("c_custkey",)))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(per_salt) >= 6  # near-uniform spread over the 8 salts
    assert max(r["count"] for r in per_salt) <= (m // 8) * 3
    hot_prefix, hot_suffix = _hot_affix_keys(canon, threshold=50)
    assert [r.name_prefix for r in hot_prefix.collect()] == ["hot block name "]
    assert hot_suffix.count() == 0  # suffixes vary -> no hot suffix block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = _skew_tagged_pairs(hot_rows, "name_prefix", hot_prefix, 8)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert any(
            "hashpartitioning" in line and "__salt" in line for line in plan.splitlines()
        ), plan[:3000]
        assert pairs.count() == m * (m - 1) // 2  # each (a < b) pair exactly once
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cached_hot_affix_keys_memoized(spark):
    """Hot-block keys are a corpus statistic: the profile runs once per
    (dir, rowcount, threshold) and later calls serve the cached keys —
    proven by handing the second call an EMPTY frame (a re-profile
    would return no hot keys)."""
    from car_etl_spark.queries import entity as E

    canon = _planted_hot_canon(spark)
    E._HOT_KEY_CACHE.clear()
    try:
        hp, hs = E._cached_hot_affix_keys(canon, "/nonexistent-dir", 50)
        assert hs is None  # suffixes vary -> no hot suffix block -> bare plan
        assert [r.name_prefix for r in hp.collect()] == ["hot block name "]
        assert len(E._HOT_KEY_CACHE) == 1
        hp2, _ = E._cached_hot_affix_keys(canon.limit(0), "/nonexistent-dir", 50)
        assert [r.name_prefix for r in hp2.collect()] == ["hot block name "]
        assert len(E._HOT_KEY_CACHE) == 1
    finally:
        E._HOT_KEY_CACHE.clear()


def test_hot_block_keys_detects_only_hot(spark):
    df = spark.createDataFrame(
        [("A", "x")] * 40 + [("A", "y")] * 5 + [("B", "x")] * 12, "seg string, k string"
    )
    hot = sorted(
        (r.seg, r.k) for r in S.hot_block_keys(df, ("seg", "k"), threshold=12).collect()
    )
    assert hot == [("A", "x"), ("B", "x")]


def test_salted_left_anti_join_equivalence(spark):
    """Anti join under salting: the dim side carries every salt for
    every key, so (k, s) missing == k missing — identical result."""
    fact = spark.range(100).select((F.col("id") % 20).alias("k"), F.col("id").alias("p"))
    dim = spark.range(10).select(F.col("id").alias("k"))
    plain = sorted(fact.join(dim, "k", "left_anti").collect())
    salted = sorted(S.salted_join(fact, dim, "k", num_salts=4, how="left_anti").collect())
    assert plain == salted and len(plain) > 0


def test_feature_flags_gate_null_tenant_fails_closed(spark):
    """Rows with a NULL tenant are unattributable: they can never match
    an override, and must NOT ride a default-on flag through a
    tenant-gated pipeline — fail closed like the rest of the module."""
    from car_etl_spark.operators.features import FeatureFlags

    ff = FeatureFlags(
        spark,
        lambda: _flag_frames(spark, [("beta", True)], [("t2", "beta", False)]),
    )
    facts = spark.createDataFrame(
        [("t1", 1), (None, 2), ("t2", 3)], "tenant_id string, v long"
    )
    got = sorted((r.tenant_id, r.v) for r in ff.gate(facts, "beta").collect())
    assert got == [("t1", 1)]  # default-on passes t1; NULL and t2-off drop


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join with ZERO Exchange —
    the shuffle was paid once at write time (the co-location layout
    100 TB fact-fact joins depend on)."""
    from pyspark.sql import functions as F

    from car_etl_spark.operators.scale import write_bucketed

    facts = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    dims = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("b")
    )
    write_bucketed(facts, "bt_facts", ("k",), num_buckets=8, sort_cols=("k",))
    write_bucketed(dims, "bt_dims", ("k",), num_buckets=8, sort_cols=("k",))
    try:
        # disable broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bt_facts").join(spark.table("bt_dims"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 500
        # aggregation on the bucket key also skips the exchange
        agg = spark.table("bt_facts").groupBy("k").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan[:2000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_facts")
        spark.sql("DROP TABLE IF EXISTS bt_dims")
