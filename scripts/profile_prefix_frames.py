"""prefix_frames df-count shape candidates (r12 "Not yet optimized" #2).

The shipped All-Pairs prefix build computes per-token document
frequency with groupBy(__tok) + join-back (SortMergeJoin on __tok),
then ranks per doc.  The span-dedup §1 trick applies:
``count().over(Window.partitionBy("__tok"))`` attaches the same df
without the join.  Exchange count stays 2 (token, then id), so the win
is bounded to the removed SMJ + aggregate — measure whether it
matters before restructuring.

Times the PREF FRAME BUILD ONLY (the changed stage; the eager
localCheckpoint executes at construction), on the sf1 Heaps corpus's
3-gram shingle sets, interleaved.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from car_etl_spark.functions import text as T
from car_etl_spark.session import get_spark
from car_etl_spark.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.cache/sf1.0")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
TAU_NUM, TAU_DEN = 4, 5

spark = get_spark("profile-prefix-frames")
spark.sparkContext.setLogLevel("ERROR")


def shingle_sets():
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    toked = docs.select("doc_id", T.tokenize(F.lower(F.col("text"))).alias("__toks"))
    return toked.select(
        "doc_id", T.shingles_from_tokens(F.col("__toks"), 3).alias("shset")
    ).filter(F.size("shset") > 0)


def build_shipped(sized):
    expl = sized.select("doc_id", "__sz", F.explode("shset").alias("__tok"))
    tok_df = expl.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    plen = (
        F.col("__sz")
        - F.expr(f"(__sz * {TAU_NUM} + {TAU_DEN - 1}) div {TAU_DEN}")
        + F.lit(1)
    )
    w = Window.partitionBy("doc_id").orderBy("__df", "__tok")
    return (
        expl.join(tok_df, "__tok")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= plen)
        .select("doc_id", "__sz", "__tok")
    )


def build_window(sized):
    expl = sized.select("doc_id", "__sz", F.explode("shset").alias("__tok"))
    plen = (
        F.col("__sz")
        - F.expr(f"(__sz * {TAU_NUM} + {TAU_DEN - 1}) div {TAU_DEN}")
        + F.lit(1)
    )
    with_df = expl.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("__tok"))
    )
    w = Window.partitionBy("doc_id").orderBy("__df", "__tok")
    return (
        with_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= plen)
        .select("doc_id", "__sz", "__tok")
    )


sized = (
    shingle_sets()
    .withColumn("__sz", F.size("shset"))
    .localCheckpoint(eager=True)
)

# parity: identical (doc, tok) multisets
a = build_shipped(sized).groupBy("doc_id", "__tok").count()
b = build_window(sized).groupBy("doc_id", "__tok").count()
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
assert diff == 0, f"prefix frames differ: {diff}"
print("prefix parity: OK")

VARIANTS = {"shipped_join": build_shipped, "window_count": build_window}
times: dict[str, list[float]] = {k: [] for k in VARIANTS}
for r in range(RUNS + 1):
    for name, fn in VARIANTS.items():
        spark.sparkContext.setJobDescription(f"profile_prefix:{name}:pass{r}")
        t0 = time.time()
        fn(sized).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if r > 0:
            times[name].append(dt)

for name, ts in times.items():
    print(f"{name:13s} median {statistics.median(ts):.3f}s  runs {[round(t, 3) for t in ts]}")
spark.stop()
