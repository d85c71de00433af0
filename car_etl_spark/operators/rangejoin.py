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

#: explode-amplification guard: an interval covering this many bins
#: means bin_seconds is ~4 orders of magnitude off the median interval
#: length (the sizing rule in the module docstring) — fail loudly at
#: the first such row instead of materializing garbage volume
MAX_BINS_PER_ROW = 10_000


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
    replicate.

    Input hygiene: malformed intervals (``end < start`` — clock skew,
    bad parses) are DROPPED before exploding rather than fed to
    ``sequence`` (which would emit a descending bin list of wasted
    rows), and an interval spanning more than :data:`MAX_BINS_PER_ROW`
    bins raises at plan-build time — that is a mis-sized ``bin_seconds``
    (or a sentinel open-ended interval), and Spark's sequence element
    cap would otherwise throw mid-job with an opaque error."""
    width = bin_seconds * 1_000_000  # micros
    p = points.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(point_ts)) / width)
    )
    start_bin = F.floor(F.unix_micros(F.col(start_ts)) / width)
    end_bin = F.floor(F.unix_micros(F.col(end_ts)) / width)
    i = (
        intervals.filter(F.col(end_ts) >= F.col(start_ts))
        .withColumn(
            "__nbins",
            F.when(
                end_bin - start_bin < MAX_BINS_PER_ROW, end_bin - start_bin
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "interval_point_join: interval spans > "
                            f"{MAX_BINS_PER_ROW} bins at bin_seconds="
                            f"{bin_seconds} — widen the bin or clamp "
                            "open-ended intervals (row start: "
                        ),
                        F.col(start_ts).cast("string"),
                        F.lit(")"),
                    )
                )
            ),
        )
        .withColumn("__bin", F.explode(F.sequence(start_bin, start_bin + F.col("__nbins"))))
        .drop("__nbins")
    )
    return (
        i.join(p, "__bin")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("__bin")
    )
