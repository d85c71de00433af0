#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a session warm-up; timing covers plan +
execution + result fetch (the driver-visible latency).  BASELINE.md's
comparable envelope is the search-shaped queries (vector/keyword/hybrid)
at ~10^4-row corpus scale; relational queries are tracked for regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    # heavy dedup first: the 48-aggregate MinHash codegen is sensitive to
    # accumulated JIT/session state from prior queries (measured 8s fresh
    # vs up to 180s late in a busy session)
    "minhash_lsh_neardup",
    # relational / analytics core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "flagship_portfolio_rollup",
    "customer_order_versioning",
    # normalization at volume (all roundtrips consolidated)
    "normalize_roundtrips",
    # entity resolution (blocked similarity join)
    "entity_match_blocked",
    # search stack (the reference's published benchmark surface)
    "doc_keyword_search",
    "vector_topk",
    "hybrid_rrf_search",
    # dedup + text analysis
    "doc_exact_dedup_stats",
    "doc_quality_scores",
    # FTS posting-list search
    "fts_posting_search",
    # EAV pivot + versioning pipeline
    "eav_pivot_effective_rent",
    "versioned_extractions",
    # nested extracted-table explode
    "extraction_tables_explode",
    # event-stream analytics
    "events_time_windows",
    "events_sessionize",
    "cdc_apply_tombstones",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from car_etl_spark.queries import build_registry
    from car_etl_spark.session import get_spark

    spark = get_spark("car-etl-spark-bench")
    registry = build_registry()

    # Warm the JVM/codegen path so per-query numbers measure the engine,
    # not first-call initialization.
    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry[name]
        t0 = time.perf_counter()
        n = spec.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_value = float(sf_label)
    except ValueError:
        sf_value = sf_label
    result = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_value,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
