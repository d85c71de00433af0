"""Count-min scale curve: bounded state + flat estimate cost as data.

The CMS claims (functions/sketches.py): per-group state is FIXED at
d x w counter rows regardless of input volume (the explode+groupBy
count combines map-side), and a point estimate joins only the probed
counters, so estimate latency is independent of how much data built
the sketch.  This script grows a heavy-tail value stream 64x
(hash-spread item ids, Zipf-ish duplication via modulo skew), builds
the sketch at each size, and times state-build and estimate.

Usage: python scripts/bench_cms_curve.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from car_etl_spark.functions import sketches as SK  # noqa: E402
from car_etl_spark.session import get_spark  # noqa: E402

SIZES = (125_000, 1_000_000, 8_000_000)
D, W = 4, 1024
PROBES = ["item-1", "item-7", "item-40", "absent"]


def make_stream(spark, n: int):
    """Heavy-tail item stream: id i maps to item xxhash(i) % (i%97+1)
    -spread buckets — low ids concentrate on few items (the hot head),
    high ids spread over ~n/50 distinct items (the long tail)."""
    return spark.range(n).select(
        F.concat(
            F.lit("item-"),
            (F.pmod(F.xxhash64("id"), F.greatest(F.lit(1), F.col("id") % (n // 50 + 1)))
             ).cast("string"),
        ).alias("val")
    )


def timed(fn, runs: int = 3) -> float:
    vals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return round(min(vals), 4)


def main() -> None:
    import json

    spark = get_spark("car-etl-spark-cms-curve")
    out = {"metric": "cms_scale_curve", "unit": "sec", "d": D, "w": W, "rows": []}
    for n in SIZES:
        stream = make_stream(spark, n)
        state = SK.cms_state(stream, [], F.col("val"), D, W)
        build_s = timed(lambda: state.count(), runs=2)
        state_rows = state.count()
        est = SK.cms_estimate(state, [], PROBES, D, W)
        est.collect()  # warm the plan
        est_s = timed(lambda: est.collect())
        row = {
            "input_rows": n,
            "state_rows": state_rows,
            "build_warm_sec": build_s,
            "estimate_warm_sec": est_s,
        }
        out["rows"].append(row)
        print(f"# cms {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
