"""Binned range join: points-in-intervals WITHOUT an equi key.

A pure interval-containment join (``p.ts BETWEEN i.start AND i.end``
with no shared key) has no hash key, so Spark's only built-in plan is
BroadcastNestedLoopJoin / cartesian + filter — O(|P| x |I|) compared
pairs, a scale-killer.  The binned form recovers an equi key from time
itself:

1. pick a bin width; every point maps to ONE bin (floor(ts / width));
2. every interval EXPLODES to the bins it overlaps
   (floor(start/width) .. floor(end/width));
3. equi-join on the bin, then apply the exact BETWEEN predicate.

Each (point, interval) pair can only meet in the point's single bin,
so the join emits no duplicates — no dedup pass.  Cost: interval-side
amplification = avg interval length / bin width (pick width ~ median
interval length to keep it O(1)), then ONE hash shuffle.  This is the
standard engine trick (Spark's own optimizer does a variant when a
range-join hint + bins are configured; DuckDB's IEJoin solves the same
problem sort-side, which is why a plain BETWEEN join is the honest
oracle twin)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
) -> DataFrame:
    """Inner-join every point to every interval containing it
    (inclusive bounds).  Output: all interval columns + all point
    columns (names must not collide).  One hash shuffle on the bin
    key; interval rows replicate ceil(len/width)+1 times, points never
    replicate."""
    width = bin_seconds * 1_000_000  # micros
    p = points.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(point_ts)) / width)
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_ts)) / width),
                F.floor(F.unix_micros(F.col(end_ts)) / width),
            )
        ),
    )
    return (
        i.join(p, "__bin")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("__bin")
    )
