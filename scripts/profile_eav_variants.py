"""eav_pivot_effective_rent shape candidates:

- as_is:      tall -> hash groupBy pivot -> filter/normalize -> global sort
              (the range sort re-samples SortAgg+normalizers)
- range_agg:  tall -> repartitionByRange(id) -> pivot (no agg exchange:
              range satisfies the clustering) -> normalize -> orderBy
              (ordered distribution already satisfied -> local sort)
- hashpart:   as_is but with repartition(id) injected below the final
              sort (materializes the normalized projection)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from car_etl_spark.functions import normalizers as N  # noqa: E402
from car_etl_spark.operators import pipeline as P  # noqa: E402
from car_etl_spark.queries.eav import _tall_fields, eav_pivot_effective_rent  # noqa: E402
from car_etl_spark.queries.parity import drow  # noqa: E402

NORMS = {
    "tenant_name": None,
    "base_rent": N.normalize_currency,
    "lease_start_date": N.normalize_date_str,
    "escalation_rate_percent": N.normalize_percent,
}


def _tail(wide):
    annual = F.col("base_rent") * 12 * (1 + F.coalesce(F.col("escalation_rate_percent"), F.lit(0.0)))
    return (
        wide.select(
            "extraction_id",
            "tenant_name",
            drow(F.col("base_rent")).alias("base_rent"),
            "lease_start_date",
            F.round("escalation_rate_percent", 6).alias("escalation_rate_percent"),
            drow(annual).alias("annual_effective_rent"),
        )
        .filter(F.col("base_rent") > 0)
    )


def as_is():
    return eav_pivot_effective_rent(spark, SF_DIR)


def range_agg():
    fields = _tall_fields(spark, SF_DIR).repartitionByRange(int(CPUS), "extraction_id")
    wide = P.pivot_eav(fields, NORMS)
    return _tail(wide).orderBy("extraction_id")


def hashpart():
    fields = _tall_fields(spark, SF_DIR)
    wide = P.pivot_eav(fields, NORMS)
    return _tail(wide).repartition(int(CPUS), "extraction_id").orderBy("extraction_id")


VARIANTS = {"as_is": as_is, "range_agg": range_agg, "hashpart": hashpart}

times: dict[str, list[float]] = {k: [] for k in VARIANTS}
for r in range(RUNS + 1):
    for name, fn in VARIANTS.items():
        spark.sparkContext.setJobDescription(f"profile_eav:{name}:pass{r}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if r > 0:
            times[name].append(dt)

for name, ts in times.items():
    print(f"{name:10s} median {statistics.median(ts):.3f}s  runs {[round(t, 3) for t in ts]}")

print("\nplan for range_agg:")
range_agg().explain("formatted")
spark.stop()
