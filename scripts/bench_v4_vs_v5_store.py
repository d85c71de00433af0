#!/usr/bin/env python
"""Interleaved A/B: v5 posting store (position arrays on every row) vs
a v4-shaped store (identical layout, positions column stripped) on the
NON-PHRASE serving paths — settles VERDICT r6 What's-wrong #3: is the
claim "positions are column-pruned away from non-phrase queries" true
in measured wall time, or do the wider row groups tax every query?

Method: copy each sf0.1 store's base with ``positions`` dropped,
written by the SAME partition/sort discipline (_write_store), then run
the serving shapes (stemmed term_search, raw-term keyword scoring)
ALTERNATELY against both layouts in one session, medians over N runs.
Also reports on-disk bytes (the positions column's storage tax).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 7


def tree_bytes(d: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(d, "**", "*"), recursive=True)
        if os.path.isfile(p)
    )


def strip_positions(spark, store, target: str):
    """Write a v4-shaped twin of ``store``: same bucket partitioning,
    same (term, doc_id) sort, positions column dropped, meta schema
    updated to match."""
    from car_etl_spark.operators.indexing import PostingStore

    shutil.rmtree(target, ignore_errors=True)
    twin = PostingStore(
        target,
        analyzer=store.analyzer,
        num_buckets=store.num_buckets,
        row_group_bytes=store.row_group_bytes,
    )
    rows = store.read(spark).drop("positions")
    twin._write_store(rows, twin.base_dir, "overwrite")
    meta = dict(store._meta())
    schema = meta.get("schema")
    if schema:
        schema = dict(schema)
        schema["fields"] = [
            f for f in schema["fields"] if f.get("name") != "positions"
        ]
        meta["schema"] = schema
    os.makedirs(os.path.dirname(twin.meta_path), exist_ok=True)
    with open(twin.meta_path, "w") as f:
        json.dump(meta, f)
    return PostingStore(target, analyzer=store.analyzer)


def keyword_score_query(store, spark, raw_terms, stem):
    """doc_keyword_search's serving core: raw-term tf scoring."""
    buckets = sorted({store.bucket_of(stem(t)) for t in raw_terms})
    idx = store.read(spark, buckets=buckets).filter(
        F.col("raw_term").isin(list(raw_terms))
    )
    return (
        idx.groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from car_etl_spark.functions.text import stem_py
    from car_etl_spark.functions.porter import porter_py
    from car_etl_spark.operators.indexing import ensure_posting_index

    ab_root = os.path.join(REPO, ".cache", "ab_v4")
    suffix5 = ensure_posting_index(spark, SF_DIR)
    porter5 = ensure_posting_index(spark, SF_DIR, analyzer="porter")
    suffix4 = strip_positions(spark, suffix5, os.path.join(ab_root, "suffix"))
    porter4 = strip_positions(spark, porter5, os.path.join(ab_root, "porter"))

    for tag, s5, s4 in (("suffix", suffix5, suffix4), ("porter", porter5, porter4)):
        b5, b4 = tree_bytes(s5.base_dir), tree_bytes(s4.base_dir)
        print(f"# {tag} base bytes: v5 {b5} v4 {b4} (positions tax {b5 / b4:.2f}x)")

    kw = ("spark", "join", "window")
    cases = {
        "fts_posting_search": (
            lambda: suffix5.term_search(spark, sorted({stem_py(t) for t in kw})),
            lambda: suffix4.term_search(spark, sorted({stem_py(t) for t in kw})),
        ),
        "fts_porter_search": (
            lambda: porter5.term_search(spark, sorted({porter_py(t) for t in kw})),
            lambda: porter4.term_search(spark, sorted({porter_py(t) for t in kw})),
        ),
        "doc_keyword_search": (
            lambda: keyword_score_query(suffix5, spark, kw, stem_py),
            lambda: keyword_score_query(suffix4, spark, kw, stem_py),
        ),
    }
    for name, (mk5, mk4) in cases.items():
        d5, d4 = mk5(), mk4()
        r5 = sorted(map(tuple, d5.collect()))
        r4 = sorted(map(tuple, d4.collect()))
        assert r5 == r4, f"{name}: layout changed results"
        t5, t4 = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter(); d5.count(); t5.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); d4.count(); t4.append(time.perf_counter() - t0)
        m5, m4 = statistics.median(t5), statistics.median(t4)
        print(
            f"{name}: v5 {m5:.4f}s v4 {m4:.4f}s (v5/v4 {m5 / m4:.2f}x) "
            f"min {min(t5):.4f}/{min(t4):.4f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
