"""Attribute q1_pricing_summary's per-row cost: is it the
decimal(30,6) casts/sums (BigDecimal-backed above precision 18), the
timestamp filter, or the scan itself?  Times the same aggregate with
sum precisions 30,6 / 18,6 / plain double (attribution only — doubles
are NOT shippable, see parity.py), plus a scan-only floor.  Noop sink,
interleaved passes, medians."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from car_etl_spark.tables import load_tables

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


def q1_variant(dec: str | None):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].filter(
        F.col("l_shipdate") <= "1999-12-01"
    )

    def s(c):
        return F.sum(c.cast(dec)) if dec else F.sum(c)

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        s(F.col("l_quantity")).alias("sum_qty"),
        s(F.col("l_extendedprice")).alias("sum_base_price"),
        s(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("sum_disc_price"),
        s((F.col("l_extendedprice") * (1.0 - F.col("l_discount"))) * (F.col("l_tax") + 1.0)).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
        s(F.col("l_discount")).alias("sum_disc"),
    )


def scan_only():
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].filter(
        F.col("l_shipdate") <= "1999-12-01"
    )
    return li.select("l_quantity", "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus")


VARIANTS = {
    "dec30": lambda: q1_variant("decimal(30,6)"),
    "dec18": lambda: q1_variant("decimal(18,6)"),
    "double": lambda: q1_variant(None),
    "scan_only": scan_only,
}

times: dict[str, list[float]] = {k: [] for k in VARIANTS}
for r in range(RUNS + 1):  # first pass is warmup
    for name, fn in VARIANTS.items():
        spark.sparkContext.setJobDescription(f"profile_q1:{name}:pass{r}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if r > 0:
            times[name].append(dt)

for name, ts in times.items():
    print(f"{name:10s} median {statistics.median(ts):.3f}s  runs {[round(t, 3) for t in ts]}")
spark.stop()
