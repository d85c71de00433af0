"""minhash signature-build shape candidates (r12 "Not yet optimized" #2).

The shipped ``exploded_shingle_rows`` builds (id, shingle) rows with
posexplode + ``lead(tok, j)`` over a per-doc window — which SHUFFLES the
entire token stream (one row per token crosses the exchange) and sorts
it, just so each row can see its n-1 successors.  But the successors
are right there in the token ARRAY the row was exploded from:
``get(__toks, pos + j)`` (0-based, null past the end — exactly lead's
contract) builds the same gram with no window, no sort, and no
token-stream shuffle; the 48 min-aggregates then do PARTIAL aggregation
before the exchange, so only 48 longs per doc per map task cross.

Variants, each timed signatures -> noop (isolating the build) and as
the full minhash_lsh_neardup row:

- window:   shipped form (exchange carries the token stream)
- getarr:   posexplode keeps the array; gram via F.get(toks, pos+j)

Values are identical by construction (same (id, sh) multiset; min-agg
is order- and duplicate-insensitive) — asserted here on sf0.01 before
timing.
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

from car_etl_spark.functions import text as T  # noqa: E402
from car_etl_spark.operators import similarity as S  # noqa: E402
from car_etl_spark.tables import load_tables  # noqa: E402


def exploded_window(docs, text_col="text", n=3, id_col="doc_id"):
    """The pre-r12 shipped form, inlined verbatim so this script keeps
    measuring the same baseline after the library switched to getarr."""
    from pyspark.sql import Window

    toked = docs.select(id_col, T.tokenize(F.lower(F.col(text_col))).alias("__toks"))
    pos = toked.select(
        id_col, F.size("__toks").alias("__k"), F.posexplode("__toks").alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", j).over(w).alias(f"__t{j}") for j in range(1, n)]
    led = pos.select(id_col, "__k", "pos", "tok", *leads)
    gram = F.concat_ws(" ", "tok", *[f"__t{j}" for j in range(1, n)])
    valid = (F.col("pos") <= F.col("__k") - n) | ((F.col("pos") == 0) & (F.col("__k") < n))
    return led.filter(valid).select(id_col, gram.alias("sh"))


def exploded_getarr(docs, text_col="text", n=3, id_col="doc_id"):
    toked = docs.select(id_col, T.tokenize(F.lower(F.col(text_col))).alias("__toks"))
    pos = toked.select(
        id_col,
        "__toks",
        F.size("__toks").alias("__k"),
        F.posexplode("__toks").alias("pos", "tok"),
    )
    gram = F.concat_ws(
        " ", "tok", *[F.get("__toks", F.col("pos") + j) for j in range(1, n)]
    )
    valid = (F.col("pos") <= F.col("__k") - n) | (
        (F.col("pos") == 0) & (F.col("__k") < n)
    )
    return pos.filter(valid).select(id_col, gram.alias("sh"))


def docs_at(sf):
    return load_tables(spark, sf, ("documents",))["documents"]


# ---- correctness gate: identical (id, sh) multisets at sf0.01 --------
small = "/root/testdata/sf0.01"
a = exploded_window(docs_at(small)).groupBy("doc_id", "sh").count()
b = exploded_getarr(docs_at(small)).groupBy("doc_id", "sh").count()
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
assert diff == 0, f"shingle multisets differ: {diff} rows"
print("sf0.01 multiset parity: OK")


def sigs_window():
    return S.minhash_from_exploded(exploded_window(docs_at(SF_DIR)))


def sigs_getarr():
    return S.minhash_from_exploded(exploded_getarr(docs_at(SF_DIR)))


def full_window():
    return S.minhash_near_duplicates(docs_at(SF_DIR), "text", "doc_id", threshold=0.5).orderBy(
        "id_a", "id_b"
    )


VARIANTS = {
    "sigs_window": sigs_window,
    "sigs_getarr": sigs_getarr,
}

times: dict[str, list[float]] = {k: [] for k in VARIANTS}
for r in range(RUNS + 1):  # pass 0 = warmup
    for name, fn in VARIANTS.items():
        spark.sparkContext.setJobDescription(f"profile_minhash:{name}:pass{r}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if r > 0:
            times[name].append(dt)

for name, ts in times.items():
    print(f"{name:12s} median {statistics.median(ts):.3f}s  runs {[round(t, 3) for t in ts]}")

print("\nplan for sigs_getarr:")
sigs_getarr().explain("formatted")
spark.stop()
