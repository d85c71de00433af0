"""Attribute exact_neardup_companions' sf1 wall across its three arms
(token_jaccard_blocked, embedding_neardup_exact_block,
shingle_prefix_neardup) — r12 "Not yet optimized" #3 asked whether the
prefix-frame build deserves a deeper pass; measure before touching.

Noop sink, interleaved passes, medians.  Default data dir is the
synthesized sf1 corpus (scripts/soak_sf1.py synthesize()).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from car_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.cache/sf1.0")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

# the tuned session (8g driver, huge-method JIT flags) — the soak's
# environment; a 1g-driver plain session OOMs the broadcast build here
spark = get_spark("profile-exact-neardup")
spark.sparkContext.setLogLevel("ERROR")

from car_etl_spark.queries.dedup import (  # noqa: E402
    embedding_neardup_exact_block,
    shingle_prefix_neardup,
    token_jaccard_blocked,
)

VARIANTS = {
    "token_jaccard": lambda: token_jaccard_blocked(spark, SF_DIR),
    "embedding_cos": lambda: embedding_neardup_exact_block(spark, SF_DIR),
    "shingle_prefix": lambda: shingle_prefix_neardup(spark, SF_DIR),
}

times: dict[str, list[float]] = {k: [] for k in VARIANTS}
for r in range(RUNS + 1):  # pass 0 = warmup
    for name, fn in VARIANTS.items():
        spark.sparkContext.setJobDescription(f"profile_exact_neardup:{name}:pass{r}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if r > 0:
            times[name].append(dt)

for name, ts in times.items():
    print(f"{name:15s} median {statistics.median(ts):.3f}s  runs {[round(t, 3) for t in ts]}")
spark.stop()
