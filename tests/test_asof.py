"""as_of_join semantics: inclusive ties, left-join nulls, tolerance,
per-key independence, and the no-amplification plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from car_etl_spark.operators.asof import as_of_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _join(spark, tolerance=None):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00:00")),
            (2, "a", _ts("2024-01-01T10:05:00")),
            (3, "a", _ts("2024-01-01T09:00:00")),  # before any right row
            (4, "b", _ts("2024-01-01T10:00:00")),  # other key
            (5, "c", _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 1.0),  # tie with left id=1
            ("a", _ts("2024-01-01T10:03:00"), 2.0),
            ("b", _ts("2024-01-01T09:30:00"), 3.0),
        ],
        "k string, ts timestamp, v double",
    )
    rows = as_of_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_values=["v"], tolerance_seconds=tolerance,
    ).collect()
    return {r.id: (r.v_asof, r.ts_asof) for r in rows}


def test_asof_backward_inclusive_and_left_nulls(spark):
    got = _join(spark)
    assert got[1] == (1.0, _ts("2024-01-01T10:00:00"))  # tie matches (inclusive)
    assert got[2] == (2.0, _ts("2024-01-01T10:03:00"))  # latest preceding wins
    assert got[3] == (None, None)                        # nothing before
    assert got[4] == (3.0, _ts("2024-01-01T09:30:00"))  # keys independent
    assert got[5] == (None, None)                        # unmatched key


def test_asof_tolerance_nulls_stale_matches(spark):
    got = _join(spark, tolerance=60.0)
    assert got[1] == (1.0, _ts("2024-01-01T10:00:00"))  # gap 0 <= 60s
    # id=2 gap is 120 s — outside the 60 s budget, inside 120 s
    assert got[2] == (None, None)
    assert _join(spark, tolerance=119.0)[2] == (None, None)
    assert _join(spark, tolerance=120.0)[2] == (2.0, _ts("2024-01-01T10:03:00"))
    # id=4 gap is 30 min — stale
    assert got[4] == (None, None)


def test_asof_single_shuffle_no_amplification(spark):
    left = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    out = as_of_join(left, right, ["k"], "ts", "ts", ["v"])
    assert out.count() == 100  # exactly one output row per left row
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_binned_range_join_no_duplicates_no_nested_loop(spark):
    from car_etl_spark.operators.rangejoin import interval_point_join

    points = spark.range(200).select(
        F.col("id").alias("pid"), F.timestamp_seconds(F.col("id") * 30).alias("ts")
    )
    intervals = spark.range(20).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.col("id") * 300).alias("s"),
        F.timestamp_seconds(F.col("id") * 300 + 240).alias("e"),
    )
    out = interval_point_join(points, intervals, "ts", "s", "e", bin_seconds=240)
    rows = out.collect()
    got = [(r.iid, r.pid) for r in rows]
    assert len(got) == len(set(got)), "binned join emitted duplicate pairs"
    assert {(p * 30 - i * 300) % 30 for i, p in got} == {0}
    for i, p in got:
        assert i * 300 <= p * 30 <= i * 300 + 240
    # every qualifying pair found (spot totals)
    assert len(got) == sum(
        1 for i in range(20) for p in range(200) if i * 300 <= p * 30 <= i * 300 + 240
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_drops_malformed_and_caps_bin_span(spark):
    """Input hygiene: end < start intervals are dropped before the bin
    explode; an interval spanning more bins than MAX_BINS_PER_ROW fails
    loudly at run time instead of materializing garbage volume."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from car_etl_spark.operators.rangejoin import MAX_BINS_PER_ROW, interval_point_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30")], "pid long, ts string"
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    ivals = spark.createDataFrame(
        [
            ("ok", "2024-01-01 00:00:00", "2024-01-01 00:01:00"),
            ("bad", "2024-01-01 00:02:00", "2024-01-01 00:01:00"),  # end < start
        ],
        "name string, s string, e string",
    ).select(
        "name",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = interval_point_join(points, ivals, "ts", "s", "e", bin_seconds=30).collect()
    assert [r.name for r in got] == ["ok"]

    huge = spark.createDataFrame(
        [("huge", "2024-01-01 00:00:00", "2025-01-01 00:00:00")],
        "name string, s string, e string",
    ).select(
        "name",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    with pytest.raises(Exception) as ei:
        interval_point_join(points, huge, "ts", "s", "e", bin_seconds=30).collect()
    assert "spans" in str(ei.value)
    assert str(MAX_BINS_PER_ROW) in str(ei.value)
