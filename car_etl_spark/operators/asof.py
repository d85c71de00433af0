"""As-of join: match each left row to the latest right row at-or-before
its timestamp, per key.

The canonical time-series enrichment operator (trade-to-quote,
event-to-last-state, purchase-to-attribution).  Spark has no built-in
as-of join; the naive range-join formulation explodes O(|L| x |R|)
candidate pairs per key.  This implementation is the UNION + WINDOW
shape — the one that scales:

1. union both sides into one keyed stream, right rows flagged;
2. sort within each key by (ts, right-before-left-on-ties);
3. ``last(right_payload, ignorenulls=True)`` over the running window
   fills every left row with the most recent right row seen;
4. filter back to left rows.

Cost: ONE hash shuffle on the keys + one sort — identical to a single
groupBy, no row amplification, no skew beyond the key's own density.
(DuckDB ships a native ASOF JOIN with exactly these semantics, which
makes it the perfect oracle twin.)

Semantics: ``direction="backward"`` (the only one implemented — the
reference use cases are all backward), INCLUSIVE on ties (a right row
at exactly the left timestamp matches, like DuckDB's ``ON r.ts <=
l.ts``); unmatched left rows keep NULL right columns (left join);
``tolerance_seconds`` nulls out matches older than the budget.

Determinism: if a key has multiple right rows at the SAME timestamp,
ties break by the packed right-value struct (documented, matching
nothing in particular — supply unique (key, ts) right rows for fully
defined output, as DuckDB's ASOF does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of left-join ``left`` to ``right`` on ``on`` keys.

    Output: every ``left`` column, plus ``<right_ts><suffix>`` (the
    matched right timestamp) and ``<v><suffix>`` for each of
    ``right_values`` — NULL where no right row is at-or-before the
    left row's ``left_ts`` (or outside ``tolerance_seconds``)."""
    lpack = F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")
    rpack = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in right_values],
    ).alias("__rrow")

    # a NULL right timestamp can never satisfy r.ts <= l.ts (DuckDB
    # ASOF semantics); without this filter NULLs sort FIRST in the
    # window and would match as "earliest ever"
    right = right.filter(F.col(right_ts).isNotNull())
    l2 = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        lpack,
        # cast to the DataType OBJECT — its simpleString render is a
        # lossy DDL round-trip that breaks on field names containing
        # spaces/colons/other DDL-significant characters
        F.lit(None).cast(
            right.select(rpack).schema["__rrow"].dataType
        ).alias("__rrow"),
    )
    r2 = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(
            left.select(lpack).schema["__lrow"].dataType
        ).alias("__lrow"),
        rpack,
    )
    merged = l2.unionByName(r2)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc(), F.col("__rrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn(
        "__match", F.last("__rrow", ignorenulls=True).over(w)
    ).filter(F.col("__is_right") == 0)

    match = F.col("__match")
    if tolerance_seconds is not None:
        in_budget = (
            F.unix_micros(F.col("__ts")) - F.unix_micros(match["__rts"])
        ) <= int(tolerance_seconds * 1_000_000)
        match = F.when(in_budget, match)

    out_cols = [F.col("__lrow")[c].alias(c) for c in left.columns]
    out_cols.append(match["__rts"].alias(f"{right_ts}{suffix}"))
    out_cols += [match[v].alias(f"{v}{suffix}") for v in right_values]
    return filled.select(*out_cols)
