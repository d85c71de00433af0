#!/usr/bin/env python
"""Attributed profile for the two standing perf-weak serving rows
(fts_bm25_search, doc_substring_search): decompose each into job floor,
pruned-store scan, and ranking/verify compute, interleaved noop runs —
the r13 ledger evidence for whether the remaining cost is reducible.
"""
import os, statistics, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from car_etl_spark.session import get_spark  # noqa: E402
from car_etl_spark.operators.indexing import ensure_posting_index  # noqa: E402
from car_etl_spark.queries.textops import SUBSTRING_PATTERN  # noqa: E402
from car_etl_spark.queries.suites import fine_grained_queries  # noqa: E402
from car_etl_spark.functions.porter import porter_py  # noqa: E402
from car_etl_spark.queries.fts import FTS_QUERY_TERMS  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 7

spark = get_spark("profile-weak-rows")
spark.conf.set("spark.sql.shuffle.partitions", "8")
fg = fine_grained_queries()

porter = ensure_posting_index(spark, SF, analyzer="porter")
tri = ensure_posting_index(spark, SF, analyzer="trigram")
pterms = sorted({porter_py(t) for t in FTS_QUERY_TERMS})
pbuckets = sorted({porter.bucket_of(t) for t in pterms})

pat = SUBSTRING_PATTERN.lower()
m = len(pat) - 2
offs = list(range(0, m, 3))
if (m - 1) not in offs:
    offs.append(m - 1)
uniq = sorted({pat[i: i + 3] for i in offs})
tbuckets = sorted({tri.bucket_of(g) for g in uniq})
print(f"# trigram store positions={tri.positions}; grams={uniq}")

VARIANTS = {
    # the two bench rows (full declared queries, prepared plans)
    "bm25_full": lambda: fg["fts_bm25_search"](spark, SF),
    "substr_full": lambda: fg["doc_substring_search"](spark, SF),
    # pruned-store scan floors: read the exact partitions/rows each
    # query reads, project what it projects, no ranking/verify
    "bm25_scan": lambda: porter.read(spark, buckets=pbuckets).filter(
        F.col("term").isin(pterms)
    ).select("doc_id", "term", "tf", "weight", "dl"),
    "substr_scan": lambda: tri.read(spark, buckets=tbuckets).filter(
        F.col("term").isin(uniq)
    ).select("doc_id", "term", "lang", *( ["positions"] if tri.positions else [] )),
}

# warm codegen
for fn in VARIANTS.values():
    fn().write.format("noop").mode("overwrite").save()

times = {k: [] for k in VARIANTS}
floors = []
for r in range(RUNS):
    t0 = time.perf_counter(); spark.range(1).count(); floors.append(time.perf_counter() - t0)
    for k, fn in VARIANTS.items():
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        times[k].append(time.perf_counter() - t0)

fl = statistics.median(floors)
print(f"# job floor median {fl:.3f}s over {RUNS}")
for k, v in times.items():
    med = statistics.median(v)
    print(f"{k:14s} med {med:.3f}s  floor-adj {med - fl:.3f}s  spread {max(v)-min(v):.3f}")
spark.stop()
