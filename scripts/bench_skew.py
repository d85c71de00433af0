#!/usr/bin/env python
"""Measure the hot-block skew guard: salted vs unsalted pair plan.

Synthesizes a blocked-entity corpus with ONE planted hot block (the
single-hot-key self-join case AQE's skew splitting cannot fix — pair
generation is quadratic per block, so the hot block is one m^2 task in
the unsalted plan) plus a realistic cold tail, then times the full
scored rollup both ways in one session, interleaved.  Also reports the
pair-stage partition histogram, which is the mechanism: unsalted, every
hot pair lands in one shuffle partition; salted, the block spreads over
`num_salts` partitions at m^2/num_salts work each.

Usage: python scripts/bench_skew.py [hot_rows] [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
COLD_BLOCKS = 1000
COLD_PER_BLOCK = 10
NUM_SALTS = 16


def main() -> None:
    from pyspark.sql import functions as F

    from car_etl_spark.queries.entity import (
        _hot_affix_keys,
        affix_pairs,
        canonical_frame,
        score_pair_rollup,
    )
    from car_etl_spark.session import get_spark

    spark = get_spark("bench-skew")
    # hot block: normalized names share the all-but-last-2-chars prefix
    # (identical length, only the last two characters vary), so ALL hot
    # rows fall in one prefix block and the pair count is the full
    # HOT*(HOT-1)/2 quadratic
    hot = [(i, "BUILDING", f"hot shared block name {i % 100:02d}", float(i % 7)) for i in range(HOT)]
    cold = [
        (10_000_000 + b * COLD_PER_BLOCK + j, "BUILDING", f"cold {b:06d} entity {j:02d}", float(j))
        for b in range(COLD_BLOCKS)
        for j in range(COLD_PER_BLOCK)
    ]
    cust = spark.createDataFrame(
        hot + cold, "c_custkey long, c_mktsegment string, c_name string, c_acctbal double"
    )
    canon = canonical_frame(cust).localCheckpoint(eager=True)  # isolate plan cost from synthesis
    hot_keys = _hot_affix_keys(canon, threshold=1000)
    hot_keys = tuple(
        hk.localCheckpoint(eager=True) if hk.count() else None for hk in hot_keys
    )
    if hot_keys[0] is None:
        sys.exit(
            f"hot_rows={HOT} is below the 1000-row profile threshold: no block "
            "is hot, the salted arm would time the identical unsalted plan and "
            "the histogram step has nothing to spread.  Use hot_rows >= 1000."
        )
    print(
        f"# corpus: {HOT} hot rows (1 block) + {COLD_BLOCKS * COLD_PER_BLOCK} cold rows "
        f"({COLD_BLOCKS} blocks); hot pair work ~{HOT * (HOT - 1) // 2:,} pairs",
        file=sys.stderr,
    )

    def one(**kw):
        t0 = time.perf_counter()
        score_pair_rollup(affix_pairs(canon, **kw)).collect()
        return time.perf_counter() - t0

    unsalted, salted = [], []
    for _ in range(RUNS):  # interleaved A/B, one session
        unsalted.append(one())
        salted.append(one(hot_keys=hot_keys, num_salts=NUM_SALTS))

    # mechanism check: shuffle-partition histogram of the PREFIX-key
    # pair join itself (before the dedup reshuffle evens everything out)
    from car_etl_spark.queries.entity import _block_cond, _pair_attrs, _skew_tagged_pairs

    def pair_hist(pairs):
        h = pairs.withColumn("pid", F.spark_partition_id()).groupBy("pid").count().collect()
        total = sum(r["count"] for r in h)
        return {"partitions": len(h), "max_share": round(max(r["count"] for r in h) / total, 4)}

    spark.conf.set("spark.sql.adaptive.enabled", "false")  # histogram without AQE coalescing
    hist = {
        "unsalted": pair_hist(_pair_attrs(canon, _block_cond("name_prefix"))),
        "salted": pair_hist(_skew_tagged_pairs(canon, "name_prefix", hot_keys[0], NUM_SALTS)),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(
        json.dumps(
            {
                "hot_rows": HOT,
                "num_salts": NUM_SALTS,
                "unsalted_sec": [round(t, 3) for t in unsalted],
                "salted_sec": [round(t, 3) for t in salted],
                "unsalted_median": round(statistics.median(unsalted), 3),
                "salted_median": round(statistics.median(salted), 3),
                "speedup": round(statistics.median(unsalted) / statistics.median(salted), 2),
                "pair_stage": hist,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
