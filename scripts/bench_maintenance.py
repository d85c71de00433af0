"""Serving-under-maintenance benchmark (r4 verdict item 6).

The headline bench serves from freshly-compacted stores; the
steady-state of an LSM index is base + pending deltas + tombstones.
This script measures that read amplification directly: it builds
throwaway posting + IVF stores for the sf0.1 corpus, times the serving
queries (a) compacted, (b) with N maintenance batches pending (at the
``COMPACT_DELTA_FRACTION`` policy boundary), and (c) re-compacted, and
prints one JSON line.  Numbers land in ARCHITECTURE.md's maintenance
section.

Usage: python scripts/bench_maintenance.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from car_etl_spark.functions.text import stem_py  # noqa: E402
from car_etl_spark.operators import indexing as IX  # noqa: E402
from car_etl_spark.session import get_spark  # noqa: E402
from car_etl_spark.tables import load_tables, parquet_rowcount  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TERMS = [stem_py(t) for t in ("spark", "windows", "merges")]
BATCH_DOCS = 100


def timed(fn, runs: int = 3) -> float:
    vals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return round(min(vals), 4)


def main() -> None:
    spark = get_spark("car-etl-spark-maintenance-bench")
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    n_docs = parquet_rowcount(SF_DIR, "documents")
    tmp = tempfile.mkdtemp(prefix="maint-bench-")
    out: dict = {"metric": "serving_under_maintenance", "sf_dir": SF_DIR, "unit": "sec"}
    try:
        store = IX.PostingStore(
            os.path.join(tmp, "postings"),
            num_buckets=IX.derive_num_buckets(
                IX.estimate_posting_rows(os.path.join(SF_DIR, "documents.parquet"))
            ),
        )
        store.build(docs)

        def posting_query():
            store.term_search(spark, TERMS).collect()

        posting_query()  # codegen warm
        out["posting_compacted"] = timed(posting_query)

        batch = 1
        while not store.should_compact():
            lo = (batch * BATCH_DOCS) % max(1, n_docs - BATCH_DOCS)
            upserts = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + BATCH_DOCS)
            ).withColumn("text", F.concat(F.col("text"), F.lit(" maintained")))
            deleted = [int(lo)]
            store.apply_batch(spark, upserts, deleted, batch=batch)
            batch += 1
        out["posting_batches_applied"] = batch - 1
        out["posting_with_deltas"] = timed(posting_query)
        t0 = time.perf_counter()
        store.compact(spark)
        out["posting_compact_cost"] = round(time.perf_counter() - t0, 4)
        out["posting_recompacted"] = timed(posting_query)

        ivf = IX.IvfStore(os.path.join(tmp, "ivf"))
        ivf.build(emb, IX.derive_num_centroids(parquet_rowcount(SF_DIR, "embeddings")))
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

        def ivf_query():
            ivf.probe_topk(spark, qvec, k=20).collect()

        ivf_query()
        out["ivf_compacted"] = timed(ivf_query)
        batch = 1
        while not ivf.should_compact():
            lo = (batch * BATCH_DOCS) % 1000
            upserts = emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + BATCH_DOCS)
            )
            ivf.apply_batch(spark, upserts, [int(lo)], batch=batch)
            batch += 1
        out["ivf_batches_applied"] = batch - 1
        out["ivf_with_deltas"] = timed(ivf_query)
        t0 = time.perf_counter()
        ivf.compact(spark)
        out["ivf_compact_cost"] = round(time.perf_counter() - t0, 4)
        out["ivf_recompacted"] = timed(ivf_query)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
