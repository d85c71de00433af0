#!/usr/bin/env python
"""Does checkpointing the canonical customer frame help entity_match?

`canonical_frame` (lower + two regexp_replace + affix substrings per
customer row) sits below TWO differently-keyed self-join exchanges in
`affix_pairs` (prefix key, suffix key) — exchange reuse fires within
each self-join but not across them, so the normalize chain executes
twice per query (plus once more in `_enrich_pairs` for the LSH row).
The question: does materializing it once (localCheckpoint — bounded,
customer grain, the same class as flagship's checkpointed aggregate)
beat re-running the regex chain?

Variants are timed interleaved with the noop sink after asserting
value parity (order-insensitive hash over the rolled-up output).

Usage: python scripts/profile_entity_canon.py [runs] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from car_etl_spark.queries import entity as E  # noqa: E402
from car_etl_spark.session import get_spark  # noqa: E402
from car_etl_spark.tables import load_tables  # noqa: E402

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def blocked(spark, checkpoint: bool):
    cust = load_tables(spark, SF_DIR, ("customer",))["customer"]
    canon = E.canonical_frame(cust)
    if checkpoint:
        canon = canon.localCheckpoint(eager=True)
    pairs = E.affix_pairs(canon, hot_keys=E._gated_hot_keys(canon, SF_DIR))
    return E.score_pair_rollup(pairs)


def result_hash(df) -> str:
    cols = sorted(df.columns)
    return (
        df.select([F.col(c).cast("string").alias(c) for c in cols])
        .select(F.concat_ws("|", *cols).alias("r"))
        .agg(F.sum(F.xxhash64("r").cast("decimal(38,0)")).alias("h"))
        .collect()[0]["h"]
    )


def main() -> None:
    spark = get_spark()
    h0 = result_hash(blocked(spark, False))
    h1 = result_hash(blocked(spark, True))
    assert h0 == h1, f"PARITY FAILED {h0} != {h1}"
    print(f"# parity OK (hash {h0})", flush=True)

    variants = {
        "as_is": lambda: blocked(spark, False),
        "canon_checkpoint": lambda: blocked(spark, True),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(RUNS + 1):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"entity canon {name} run{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if r > 0:
                times[name].append(dt)
            print(f"#   run{r} {name}: {dt:.3f}s", flush=True)
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s", flush=True)


if __name__ == "__main__":
    main()
