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

    def salts_of(df):
        salted = df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8)).cast("int"),
        )
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
