#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is measured with one cold pass (whole-stage-codegen
compile) followed by N=5 INTERLEAVED warm passes over the full set
(r11 methodology — see the inline note at the measurement loop);
"queries" carries per-query warm MEDIANS, BENCH_DETAIL.json carries
every run, per-query IQR, per-pass job floors, and floor-adjusted
medians.  Timing covers plan + execution + result fetch (the
driver-visible latency).  BASELINE.md's comparable envelope is the
search-shaped queries (vector/keyword/hybrid) at ~10^4-row corpus
scale; relational queries are tracked for regression.

METHODOLOGY NOTE (round-over-round comparability): BENCH_r01 reported a
single timed run per query ("value" == that run's total).  From r02
onward "value" is the WARM total and "total_cold" carries the
single-run-equivalent number — so compare r01's value against later
rounds' total_cold, not value.  Warm is the figure comparable to
BASELINE.md, whose search latencies are means from a running service
with resident indexes.

From r04 the search-shaped queries (vector/keyword/fts/hybrid) SERVE
from persisted indexes (posting table bucketed by term, IVF layout
partitioned by centroid — car_etl_spark/operators/indexing.py) with
prepared per-session plans, mirroring the reference's GIN/HNSW
index-resident serving.  Its published latencies exclude index build,
so the bench builds the stores in an explicit PREP phase before any
query is timed and reports that wall separately as "index_prep_sec"
(on a warm content-addressed cache the prep is a few stat calls and
rounds to ~0).  Cold therefore means cold SERVING (first-call plan +
codegen compile against a resident index), the same thing the
reference's first request after restart pays.  Correctness of the
serving paths is oracle-gated like everything else, and the
scan-twins (*_scan) keep the build-path forms green alongside.

HEADLINE-SET CHANGES (for round-over-round total comparisons): r04
added fts_porter_search and hybrid_porter_ivf_search (+~0.4 s warm) —
compare totals per-query, or subtract the added rows when comparing
r04 totals against r03.  r06 added hybrid_rerank_page (the baseline's
450 ms hybrid+rerank row, previously unbenched), pii_entity_counts,
media_features_report, rag_context_modes, training_mix_suite,
fts_bm25_search, and fts_phrase_search — subtract those seven when
comparing r06 totals against r05.  r07 added vector_filtered_topk,
vector_pq_topk, events_rollup_served, doc_substring_search, and
doc_regex_search — subtract those five when comparing r07 totals
against r06.  r08 added vector_tenant_filtered_topk (the combined
tenant x metadata-filter certified serving arm) — subtract it when
comparing r08 totals against r07; r08 also fused the PQ serve
(vector_pq_topk ~0.41 -> ~0.10 s warm, a real plan change, not noise).
r09 consolidated the registry pair entity_match_blocked +
entity_match_lsh_extended into the entity_match_modes suite (registry
headroom; COVERAGE.md merge table) — the BENCH set is unchanged:
entity_match_blocked keeps its own row via fine_grained_queries, so
its numbers stay comparable round-over-round.  r10 BENCH set is
unchanged; two real plan changes (hybrid_rerank_page wave fusion
0.33 -> ~0.23 s warm; dedup cosine-verify norm staging, sf1-visible)
are the only code-driven deltas.  The r9 ledger's q1/q3/flagship
+11-30% movers were settled by interleaved A/B (AB_r10.json):
NOISE — mixed-sign medians inside 1-2 s within-session spreads;
same verdict covers the r10 box-noise episode (job floor 0.34 s on
one run vs 0.157 s on the rerun minutes later).

r11 ROW-DEFINITION NOTE: the registry row `doc_exact_dedup_stats`
gained the former `doc_dup_clusters` connected-components closure
(registry consolidation — COVERAGE.md); the BENCH row of that name
keeps timing the original plain source-grain form via
fine_grained_queries (resolve() prefers fine names), so its series
stays comparable.  A first r11 bench run before this split showed the
merged row at 5.0 s vs 0.85 — that was the added closure work, not a
regression.

r11 METHODOLOGY CHANGE: warm numbers switch from per-query min-of-2
(three consecutive runs per query) to per-query MEDIAN over 5
interleaved full-set passes, with IQR and per-pass floors recorded in
BENCH_DETAIL.json.  Three consecutive rounds burned cycles
adjudicating ±13-52% "movers" that every interleaved A/B called NOISE
— the adjudication now lives in the primary artifact (mover protocol:
median delta must clear max(both rounds' IQRs) with floors within
~25%).  Expect r11 medians to read a few % ABOVE r10 mins on identical
code (median >= min by construction); compare r12+ against r11, and
settle any residual dispute against r10 via scripts/bench_ab.py as
before.

From r05 the registry consolidated same-grain queries into suite
entries (COVERAGE.md merge table) so every entry fits the driver's
50-row correctness window; the bench keeps timing the FINE-GRAINED
functions (resolved from their home modules when no longer registry
keys), so per-query numbers stay comparable round-over-round.

r12 ADJUDICATION (AB_r11.json): the six r11-vs-r10 movers
(fts_bm25_search +73%, hybrid_rrf_search +64%, cdc_apply_tombstones,
doc_substring_search, entity_match_blocked, doc_keyword_search) are
ALL NOISE by interleaved A/B vs cce0389: the r10 CODE re-measured in
the r12 session reads 0.350 s (bm25) / 0.356 s (hybrid) — 1.6-1.8x
its own BENCH_r10 recordings and right at r11's — so the jump was a
box-regime shift; every within-session median delta is smaller than
the base side's own spread.  BENCH_r11 medians are the SERIES
BASELINE from here: r12+ movers adjudicate against r11 under the IQR
protocol above.

r12 METHODOLOGY CHANGE (sink): timings switch from ``df.count()`` to a
noop-sink write (``df.write.format("noop")``), which forces the FULL
result to be produced.  Under count() Catalyst legally prunes work the
query claims to measure: aggregate expressions drop when only group
keys are needed (q1's sums never ran — 0.75 s vs 2.96 s honest),
provably-cardinality-preserving outer joins are eliminated outright
(span_dedup_report's entire fingerprint subtree was skipped: 0.56 s
fake vs 2.5 s real — caught when a null-safe join key change defeated
the elimination rule and the row "regressed" 4x), and unused output
columns never compute.  A count-vs-noop audit over all 50 rows found
25 rows reading >=1.5x higher under the honest sink (worst:
extraction_pipeline_versions 5.2x, events_asof_attribution 9.9x).
Row counts still come from one count() per query AFTER the timed noop
write.  THE SERIES RESETS HERE: r12 noop medians are the new baseline;
r13+ movers adjudicate against r12 under the same IQR protocol.
BENCH_r11 numbers are count-sink readings — comparable to r12 only
via the A/B scripts (scripts/bench_ab.py mirrors the noop sink).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
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
    # exact substring (ILIKE) serving from the trigram store (r7)
    "doc_substring_search",
    # trigram-prefiltered regex search (r7, Cox code-search design)
    "doc_regex_search",
    "vector_topk",
    "vector_ivf_topk",
    # metadata-filtered IVF serving (r7: certified walk over matching counts)
    "vector_filtered_topk",
    "vector_tenant_filtered_topk",
    # product-quantized serving (r7: certified ADC over the code column)
    "vector_pq_topk",
    "hybrid_rrf_search",
    "hybrid_porter_ivf_search",
    # hybrid + cross-encoder-stub rerank page (baseline's 450 ms row)
    "hybrid_rerank_page",
    # dedup + text analysis (minhash in natural position: the round-1
    # run-first crutch is gone — the 48-agg codegen variance was fixed by
    # -XX:-DontCompileHugeMethods + code-cache sizing in session.py, and
    # the shingle build no longer explodes an interpreted HOF array)
    "minhash_lsh_neardup",
    "doc_exact_dedup_stats",
    # span-level exact substring dedup (r12, Lee et al. 2021 — subtract
    # when comparing r12 totals against r11)
    "span_dedup_report",
    "doc_quality_scores",
    # FTS posting-list search (suffix analyzer + full-Porter analyzer)
    "fts_posting_search",
    "fts_porter_search",
    # Okapi BM25 + positional phrase search over the same porter store
    # (r6; subtract alongside the other r6 additions vs r05 totals)
    "fts_bm25_search",
    "fts_phrase_search",
    # EAV pivot + versioning pipeline
    "eav_pivot_effective_rent",
    "versioned_extractions",
    # nested extracted-table explode
    "extraction_tables_explode",
    # event-stream analytics
    "events_time_windows",
    # continuous-aggregate serving: daily cascade from the persisted
    # rollup store's minute partials (r7; never rescans raw events)
    "events_rollup_served",
    "events_sessionize",
    "cdc_apply_tombstones",
    # PII detection + redaction completeness over documents
    "pii_entity_counts",
    # training-data mixing: stratified sample + contamination screen
    "training_mix_suite",
    # sequence packing for the training exporter (r11 — subtract when
    # comparing r11 totals against r10)
    "training_pack",
    # multimodal decode kernels over synthesized binaries
    "media_features_report",
    # RAG context budgeting (regex-BPE + learned-BPE arms)
    "rag_context_modes",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from car_etl_spark.queries import build_registry
    from car_etl_spark.session import get_spark

    spark = get_spark("car-etl-spark-bench")
    # Scale-aware shuffle sizing: at sub-10^6-row inputs 32-way exchanges
    # cost more in task fan-out than they buy in parallelism; AQE still
    # coalesces, but the first exchange pays the fan-out.  On a real
    # cluster this is per-job config; sf>=1 keeps the session default.
    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        if float(sf_label) <= 0.1:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
    except ValueError:
        pass
    registry = build_registry()

    # fine-grained functions that consolidated into suite registry
    # entries in r05 — benched individually for round-over-round
    # comparability (same names, same sub-expressions); ONE shared map
    # in queries/suites.py, so bench and plan contracts cannot drift
    from car_etl_spark.queries.suites import fine_grained_queries

    extra_fns = fine_grained_queries()

    def resolve(name):
        # fine-grained names FIRST: when a consolidation folds extra
        # work into a registry row of the SAME name (r11:
        # doc_exact_dedup_stats gained the doc_dup_clusters closure),
        # the bench keeps timing the original form so the per-query
        # series stays comparable round-over-round
        return extra_fns[name] if name in extra_fns else registry[name].fn

    # Warm the JVM/codegen path so per-query numbers measure the engine,
    # not first-call initialization.
    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()

    # PREP: materialize the persisted search indexes before timing, the
    # analog of the reference's GIN/HNSW being trigger-maintained and
    # resident before its latencies are measured.  Content-addressed:
    # on a warm cache this is a few os.stat calls (~0 s); on a fresh
    # checkout it is the one-time build cost, reported separately.
    from car_etl_spark.operators.indexing import ensure_ivf_index, ensure_posting_index

    from car_etl_spark.streaming.rollup_store import ensure_rollup_store

    t0 = time.perf_counter()
    ensure_posting_index(spark, sf_dir)
    ensure_posting_index(spark, sf_dir, analyzer="porter")
    ensure_posting_index(spark, sf_dir, analyzer="trigram")
    ensure_ivf_index(spark, sf_dir)
    ensure_rollup_store(spark, sf_dir)
    index_prep = round(time.perf_counter() - t0, 4)
    print(f"# index prep (posting + IVF + rollup stores): {index_prep:.3f}s", file=sys.stderr)

    # Measured scheduling floor: the wall time of a minimal one-task job
    # on this session.  Sub-second query latencies bottom out here — the
    # floor is context for reading the search-query numbers against
    # BASELINE.md's in-process service latencies (it amortizes away at
    # real scale, where a scan is thousands of tasks).
    floor_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1).count()
        floor_runs.append(time.perf_counter() - t0)
    job_floor = round(min(floor_runs), 4)

    # INTERLEAVED-MEDIAN METHODOLOGY (r11, replaces per-query min-of-2):
    # one COLD pass over the whole set (each query's whole-stage-codegen
    # compile), then N warm passes (default 5) that each sweep the FULL
    # query set in order, with the job floor re-measured at the top of
    # every pass.  Box-noise episodes on this machine are time-localized
    # (the r9-r10 ledger: the floor itself swung 0.08->0.34 s between
    # back-to-back identical-code runs), so consecutive per-query runs
    # alias an episode into one query's number while every other query
    # escapes it; interleaving spreads any episode across ALL queries
    # and the per-query MEDIAN + IQR make it visible instead of
    # decisive.  This folds scripts/bench_ab.py's adjudication into the
    # primary artifact: a round-over-round mover is REAL only when its
    # median delta clears max(its own IQR, the previous round's IQR)
    # AND the per-pass floors of both runs agree within ~25% — anything
    # else is the documented box noise, no separate A/B session needed.
    import statistics

    # >=1: the medians below are over the warm passes — a cold-only
    # run would finish the whole cold sweep and then die on median([])
    n_warm = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5")))
    floors: list[float] = [job_floor]
    warm_runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    timings_cold: dict[str, float] = {}
    rowcounts: dict[str, int] = {}
    for p in range(n_warm + 1):
        if p > 0:
            t0 = time.perf_counter()
            spark.range(1).count()
            floors.append(round(time.perf_counter() - t0, 4))
        for name in HEADLINE:
            fn = resolve(name)
            # noop-sink write: forces the FULL result (see the r12
            # ledger note — count() let Catalyst skip aggregate
            # expressions, eliminable joins, and pruned columns)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            if p == 0:
                timings_cold[name] = round(dt, 4)
                # row counts are reported, not timed: one count() per
                # query on the cold pass only
                rowcounts[name] = fn(spark, sf_dir).count()
            else:
                warm_runs[name].append(round(dt, 4))
        print(
            f"# pass {p} ({'cold' if p == 0 else 'warm'}) done, "
            f"floor {floors[-1]:.3f}s",
            file=sys.stderr,
        )
    timings: dict[str, float] = {}
    iqr: dict[str, float] = {}
    for name in HEADLINE:
        vals = warm_runs[name]
        timings[name] = round(statistics.median(vals), 4)
        if len(vals) >= 4:
            q = statistics.quantiles(vals, n=4)
            iqr[name] = round(q[2] - q[0], 4)
        else:
            iqr[name] = round(max(vals) - min(vals), 4)
        print(
            f"# {name}: cold {timings_cold[name]:.3f}s / warm median "
            f"{timings[name]:.3f}s iqr {iqr[name]:.3f}s "
            f"({rowcounts[name]} rows)",
            file=sys.stderr,
        )
    floor_med = round(statistics.median(floors), 4)

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_value = float(sf_label)
    except ValueError:
        sf_value = sf_label
    # The driver captures a bounded TAIL of stdout and parses the last
    # JSON line out of it (BENCH_r06 was cut mid-line when warm + cold
    # dicts pushed the single line past the window).  So: full detail
    # (cold runs, prep) goes to stderr, and the FINAL stdout line is the
    # compact required form — short enough to always land whole inside
    # the tail window.
    # Full-fidelity artifact (every warm run, per-query median/IQR,
    # per-pass floors, cold pass, floor-adjusted medians for reading
    # the floor-adjacent rows against sub-floor baseline envelopes)
    # goes to a FILE — the stdout line must stay short enough to land
    # whole inside the driver's tail window.
    detail = {
        "methodology": "interleaved_median",
        "passes_warm": n_warm,
        "warm_runs": warm_runs,
        "queries_median": timings,
        "queries_iqr": iqr,
        "queries_floor_adjusted": {
            k: round(max(0.0, v - floor_med), 4) for k, v in timings.items()
        },
        "queries_cold": timings_cold,
        "total_cold": round(sum(timings_cold.values()), 4),
        "floor_per_pass": floors,
        "floor_median_sec": floor_med,
        "index_prep_sec": index_prep,
        "sf": sf_value,
        "mover_protocol": (
            "a round-over-round mover is real only when its median delta "
            "clears max(this round's IQR, last round's IQR) and the two "
            "runs' per-pass floors agree within ~25%"
        ),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print("# detail written to " + detail_path, file=sys.stderr)
    result = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "job_floor_sec": round(min(floors), 4),
        "floor_median_sec": floor_med,
        "passes_warm": n_warm,
        "iqr_total_sec": round(sum(iqr.values()), 4),
        "detail": "BENCH_DETAIL.json",
        "sf": sf_value,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
