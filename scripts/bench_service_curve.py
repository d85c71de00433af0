#!/usr/bin/env python
"""Service-conditions benchmark: concurrent mixed search workload,
per-mode avg + P95 vs the reference's published P95 columns.

The reference's table (`/root/reference/docs/HYBRID_SEARCH.md:218-221`,
mirrored in BASELINE.md) publishes avg AND P95 measured under a RUNNING
service: vector 150/200 ms, keyword 80/120 ms, hybrid 280/350 ms,
rerank 450/600 ms (avg/P95).  bench.py reports single-stream warm
minima — the avg comparison — but P95-under-concurrency was the one
baseline axis never compared.  This script drives N concurrent client
streams (one shared SparkSession, ``spark.scheduler.mode=FAIR``, one
on-demand scheduler pool per stream so no stream's jobs queue behind
another's) through a mixed request sequence over the six serving modes,
and reports per-mode avg/P50/P95/max at each concurrency level.

Methodology notes:
- Warm serving throughout (stores resident + prepared plans compiled
  before measurement), matching how the reference measured: a running
  service with GIN/HNSW resident.
- Each stream round-robins the modes from a stream-specific offset, so
  at any instant the in-flight mix is heterogeneous — the service
  condition, not a lockstep barrage of one plan.
- Python threads overlap genuinely: ``DataFrame.count()`` blocks on the
  py4j socket with the GIL released; PySpark's pinned-thread mode (the
  Spark 4 default) maps each Python thread to its own JVM thread so
  per-thread scheduler pools apply.
- P95 over pooled per-mode samples at each level; at least ~60 samples
  per mode per level (total request budget is fixed per level, split
  across streams).

Output: one JSON line
  {"metric": "service_curve", "sf": ..., "levels": {"1": {mode:
   {"avg": s, "p50": s, "p95": s, "max": s, "n": int}}, ...},
   "baseline_p95_ms": {...}, "job_floor_sec": ...,
   "memory": {jvm/python RSS floor, per-mode peakExecutionMemory via a
    solo REST stage-diff pass, per-level RSS peak/delta},
   "baseline_memory_mb": the reference's §Memory columns}

Usage: python scripts/bench_service_curve.py [requests_per_mode_per_level]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PER_MODE = int(sys.argv[1]) if len(sys.argv) > 1 else 60
LEVELS = (1, 8, 32)

# mode -> (bench fine-grained query name, baseline P95 ms or None)
MODES = {
    "vector": ("vector_ivf_topk", 200.0),
    "keyword": ("fts_posting_search", 120.0),
    "hybrid": ("hybrid_rrf_search", 350.0),
    "rerank": ("hybrid_rerank_page", 600.0),
    # beyond-reference serving modes, graded against the keyword
    # envelope in the round ledgers — measured here under the same
    # service conditions for the same honesty
    "substring": ("doc_substring_search", None),
    "regex": ("doc_regex_search", None),
}


def percentile(xs: list[float], q: float) -> float:
    ys = sorted(xs)
    i = max(0, min(len(ys) - 1, round(q * (len(ys) - 1))))
    return ys[i]


UI_PORT = 4047


def _jvm_pid() -> int | None:
    """The local-mode JVM is our direct java child process."""
    me = os.getpid()
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                st = f.read().split()
            if int(st[3]) == me and "java" in st[1]:
                return int(p)
        except (OSError, ValueError, IndexError):
            continue
    return None


def _rss_mb(pid: int | None) -> float | None:
    if pid is None:
        return None
    try:
        with open(f"/proc/{pid}/statm") as f:
            pages = int(f.read().split()[1])
        return round(pages * os.sysconf("SC_PAGE_SIZE") / 2**20, 1)
    except (OSError, ValueError, IndexError):
        return None


def _rest_stages(app_id: str) -> list[dict]:
    import urllib.request

    url = f"http://127.0.0.1:{UI_PORT}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


class RssSampler(threading.Thread):
    """Background peak-RSS tracker over the JVM + this python process
    (50 ms period — serving requests are 100 ms+, so the peak is real)."""

    def __init__(self, jvm_pid: int | None):
        super().__init__(daemon=True)
        self.jvm_pid = jvm_pid
        self.stop_evt = threading.Event()
        self.jvm_peak = _rss_mb(jvm_pid) or 0.0
        self.py_peak = _rss_mb(os.getpid()) or 0.0

    def run(self) -> None:
        while not self.stop_evt.wait(0.05):
            j = _rss_mb(self.jvm_pid)
            p = _rss_mb(os.getpid())
            if j is not None:
                self.jvm_peak = max(self.jvm_peak, j)
            if p is not None:
                self.py_peak = max(self.py_peak, p)

    def stop(self) -> tuple[float, float]:
        self.stop_evt.set()
        self.join()
        return self.jvm_peak, self.py_peak


def main() -> None:
    from car_etl_spark.queries import build_registry
    from car_etl_spark.queries.suites import fine_grained_queries
    from car_etl_spark.session import get_spark

    spark = get_spark(
        "car-etl-spark-service",
        extra_conf={
            "spark.scheduler.mode": "FAIR",
            # status REST API for per-mode peakExecutionMemory (the
            # AppStatus listener runs regardless; the UI adds only a
            # jetty endpoint, not per-task accounting overhead)
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR", (
        "FAIR scheduler required — a FIFO session serializes concurrent "
        "streams behind the longest job; restart without a live session"
    )

    registry = build_registry()
    fine = fine_grained_queries()

    def resolve(name):
        return registry[name].fn if name in registry else fine[name]

    fns = {mode: resolve(qname) for mode, (qname, _) in MODES.items()}

    # PREP: stores + prepared plans + codegen, untimed (bench.py's
    # discipline — the reference's latencies exclude index build too)
    t0 = time.perf_counter()
    for mode, fn in fns.items():
        # warm with the SAME sink the timed requests use — count()
        # compiles a pruned plan and the first timed noop request
        # would pay the full plan's codegen inside its sample
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    print(f"# prep+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    floor_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1).count()
        floor_runs.append(time.perf_counter() - t0)
    job_floor = round(min(floor_runs), 4)

    # ---- memory axis (BASELINE.md §Memory: ~10 MB/request base,
    # ~50 MB with the rerank model resident) ----
    jvm_pid = _jvm_pid()
    app_id = spark.sparkContext.applicationId
    mem: dict = {
        "jvm_rss_floor_mb": _rss_mb(jvm_pid),
        "python_rss_floor_mb": _rss_mb(os.getpid()),
        "levels": {},
    }
    # per-mode execution memory, attributed via a solo pass: diff the
    # REST stage table around one warm request and sum the new stages'
    # peakExecutionMemory — Spark's own per-task unsafe/execution
    # allocation metric, the honest analog of "search memory per
    # request" (heap floor is JVM runtime, not request state)
    per_mode_exec: dict[str, float] = {}
    try:
        seen = {s["stageId"] for s in _rest_stages(app_id)}
        for mode, fn in fns.items():
            fn(spark, SF_DIR).count()
            time.sleep(0.3)  # listener bus drain
            stages = _rest_stages(app_id)
            new = [
                s for s in stages
                if s["stageId"] not in seen and s["status"] != "SKIPPED"
            ]
            seen.update(s["stageId"] for s in stages)
            per_mode_exec[mode] = round(
                sum(s.get("peakExecutionMemory", 0) for s in new) / 2**20, 2
            )
        mem["per_mode_exec_peak_mb"] = per_mode_exec
    except Exception as e:  # REST off / port clash: keep the RSS axis
        print(f"# exec-memory attribution skipped: {e}", file=sys.stderr)

    mode_list = list(MODES)
    levels_out: dict[str, dict] = {}
    for n_streams in LEVELS:
        total_requests = PER_MODE * len(mode_list)
        per_stream = max(1, total_requests // n_streams)
        samples: dict[str, list[float]] = {m: [] for m in mode_list}
        lock = threading.Lock()
        errors: list[BaseException] = []

        def stream(idx: int) -> None:
            try:
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", f"stream-{idx}"
                )
                local: dict[str, list[float]] = {m: [] for m in mode_list}
                for r in range(per_stream):
                    mode = mode_list[(idx + r) % len(mode_list)]
                    # noop sink — the request must PRODUCE its result
                    # (bench.py r12: count() lets Catalyst skip
                    # aggregate exprs / prune output columns)
                    t0 = time.perf_counter()
                    fns[mode](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    local[mode].append(time.perf_counter() - t0)
                with lock:
                    for m, xs in local.items():
                        samples[m].extend(xs)
            except BaseException as e:  # surface worker failures
                with lock:
                    errors.append(e)

        jvm_base = _rss_mb(jvm_pid)
        sampler = RssSampler(jvm_pid)
        sampler.start()
        t_level = time.perf_counter()
        threads = [
            threading.Thread(target=stream, args=(i,), daemon=True)
            for i in range(n_streams)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        wall = time.perf_counter() - t_level
        jvm_peak, py_peak = sampler.stop()
        mem["levels"][str(n_streams)] = {
            "jvm_rss_base_mb": jvm_base,
            "jvm_rss_peak_mb": round(jvm_peak, 1),
            "jvm_rss_delta_mb": round(jvm_peak - (jvm_base or jvm_peak), 1),
            "python_rss_peak_mb": round(py_peak, 1),
            "delta_per_stream_mb": round(
                (jvm_peak - (jvm_base or jvm_peak)) / n_streams, 1
            ),
        }
        n_total = sum(len(v) for v in samples.values())
        out = {}
        for m in mode_list:
            xs = samples[m]
            out[m] = {
                "avg": round(statistics.fmean(xs), 4),
                "p50": round(percentile(xs, 0.50), 4),
                "p95": round(percentile(xs, 0.95), 4),
                "max": round(max(xs), 4),
                "n": len(xs),
            }
        out["_level"] = {
            "wall_sec": round(wall, 2),
            "requests": n_total,
            "throughput_rps": round(n_total / wall, 2),
        }
        levels_out[str(n_streams)] = out
        print(
            f"# level {n_streams}: {n_total} reqs in {wall:.1f}s "
            f"({n_total / wall:.1f} req/s)",
            file=sys.stderr,
        )
        for m in mode_list:
            s = out[m]
            print(
                f"#   {m:10s} avg {s['avg']:.3f} p50 {s['p50']:.3f} "
                f"p95 {s['p95']:.3f} max {s['max']:.3f} (n={s['n']})",
                file=sys.stderr,
            )

    sf_label = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_value: float | str = float(sf_label)
    except ValueError:
        sf_value = sf_label
    print(
        json.dumps(
            {
                "metric": "service_curve",
                "sf": sf_value,
                "levels": levels_out,
                "baseline_p95_ms": {
                    m: MODES[m][1] for m in mode_list if MODES[m][1] is not None
                },
                "job_floor_sec": job_floor,
                "memory": mem,
                "baseline_memory_mb": {
                    "per_request_base": 10.0,
                    "with_rerank_model_resident": 50.0,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
