#!/usr/bin/env python
"""Cold-serving latency: first-request tax, with and without the
prepare_serving() warm-boot hook, at sf1.0.

The r8 sf1.0 soak showed first-request (cold) serving at 5-6x warm on
the heaviest modes (vector_topk_modes 6.5 s, hybrid_rerank_page 3.2 s,
rag_context_modes 3.0 s vs <=1 s warm) — a restart tax the reference
does not pay because its service warms indexes at boot.  This script
measures the story in THREE separate JVMs (subprocess arms) against the
same resident stores:

  prep     — builds-if-missing every sf1.0 store (content-addressed;
             excluded from all serving numbers, like every bench here)
  cold     — fresh session, JVM warmed on a NON-serving query, then
             each serving mode's FIRST call timed (the restart tax),
             then warm = median of its next 3 calls.  Also splits the
             first call into plan-construction (fn() -> analyzed
             DataFrame) vs execution (codegen compile + first-touch IO).
  prepared — fresh session, prepare_serving() runs first (timed, the
             boot cost), then each mode's first REAL request timed,
             then warm = median of its next 3 calls.

r12 METHODOLOGY: prepared_over_warm divides by the PREPARED ARM'S OWN
warm median (within-JVM).  r11 divided one prepared-arm sample by one
cold-arm sample — two JVMs minutes apart on a box whose sub-second
readings swing 2-3x between runs (the warm denominator for
doc_keyword_search read 0.334 then 0.869 on back-to-back identical-code
runs), so the worst-mode ratio measured the box, not the boot hook.

Done-criterion: prepared-first <= 2x warm for every serving mode.

Output: one JSON line {"metric": "cold_boot", "modes": {name:
  {"cold_first": s, "cold_plan": s, "warm": s, "prepared_first": s,
   "prepared_over_warm": x}}, "prepare_total_sec": s, ...}

Usage: python scripts/bench_cold_boot.py          (orchestrates arms)
       python scripts/bench_cold_boot.py --arm cold|prepared|prep
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".cache", "sf1.0"))


def _session():
    from car_etl_spark.session import get_spark

    return get_spark("car-etl-spark-coldboot")


def _ensure_stores(spark) -> float:
    from car_etl_spark.operators.indexing import (
        ensure_ivf_index,
        ensure_posting_index,
        ensure_tenant_ivf_index,
    )
    from car_etl_spark.streaming.rollup_store import ensure_rollup_store

    t0 = time.perf_counter()
    ensure_posting_index(spark, SF_DIR)
    ensure_posting_index(spark, SF_DIR, analyzer="porter")
    ensure_posting_index(spark, SF_DIR, analyzer="trigram")
    ensure_ivf_index(spark, SF_DIR)
    ensure_tenant_ivf_index(spark, SF_DIR)
    ensure_rollup_store(spark, SF_DIR)
    return time.perf_counter() - t0


def arm_prep() -> None:
    spark = _session()
    dt = _ensure_stores(spark)
    print(json.dumps({"arm": "prep", "store_prep_sec": round(dt, 2)}))
    spark.stop()


def _warm_medians(spark, fns: dict, passes: int = 3) -> dict:
    """Per-mode warm = median over INTERLEAVED full-set passes (the
    r11 bench.py methodology): a mode's steady state in a real service
    includes the cross-mode cache pressure of other requests running
    between its calls — back-to-back repeats of one mode measure an
    unfairly fast locality regime that no real request ever sees."""
    import statistics

    vals: dict[str, list[float]] = {n: [] for n in fns}
    for _ in range(passes):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            # noop sink — bench.py r12 sink honesty, and the warm-boot
            # hook now pre-compiles the full (noop) plan
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            vals[name].append(time.perf_counter() - t0)
    return {n: round(statistics.median(v), 3) for n, v in vals.items()}


def arm_cold() -> None:
    from car_etl_spark.queries import build_registry
    from car_etl_spark.queries.suites import serving_modes

    spark = _session()
    _ensure_stores(spark)  # content-addressed: stat calls after prep arm
    # JVM/codegen warmup on a NON-serving query (bench.py discipline) so
    # "cold" isolates the serving path's own first-request tax, not
    # generic session startup
    build_registry()["q1_pricing_summary"].fn(spark, SF_DIR).count()
    out = {}
    fns = serving_modes()
    for name, fn in fns.items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)  # plan construction + analysis (+ probe jobs)
        t_plan = time.perf_counter() - t0
        df.write.format("noop").mode(
            "overwrite"
        ).save()  # codegen compile + first-touch IO + execute (full plan)
        t_first = time.perf_counter() - t0
        out[name] = {
            "cold_first": round(t_first, 3),
            "cold_plan": round(t_plan, 3),
        }
    for name, w in _warm_medians(spark, fns).items():
        out[name]["warm"] = w
    print(json.dumps({"arm": "cold", "modes": out}))
    spark.stop()


def arm_prepared() -> None:
    from car_etl_spark.api import prepare_serving
    from car_etl_spark.queries import build_registry
    from car_etl_spark.queries.suites import serving_modes

    spark = _session()
    _ensure_stores(spark)
    build_registry()["q1_pricing_summary"].fn(spark, SF_DIR).count()
    t0 = time.perf_counter()
    boot = prepare_serving(spark, SF_DIR)
    prep_total = time.perf_counter() - t0
    out = {}
    fns = serving_modes()
    for name, fn in fns.items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = {"prepared_first": round(time.perf_counter() - t0, 3)}
    for name, w in _warm_medians(spark, fns).items():
        out[name]["prepared_warm"] = w
    print(
        json.dumps(
            {
                "arm": "prepared",
                "prepare_total_sec": round(prep_total, 2),
                "prepare_per_mode": boot,
                "modes": out,
            }
        )
    )
    spark.stop()


def main() -> None:
    if "--arm" in sys.argv:
        arm = sys.argv[sys.argv.index("--arm") + 1]
        {"prep": arm_prep, "cold": arm_cold, "prepared": arm_prepared}[arm]()
        return
    results = {}
    for arm in ("prep", "cold", "prepared"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", arm],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            raise SystemExit(f"arm {arm} failed")
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        results[arm] = json.loads(line)
        print(f"# arm {arm} done", file=sys.stderr)
    modes = {}
    worst = 0.0
    for name, c in results["cold"]["modes"].items():
        p = results["prepared"]["modes"][name]["prepared_first"]
        pw = results["prepared"]["modes"][name]["prepared_warm"]
        # within-JVM ratio (see the methodology note in the docstring)
        ratio = round(p / pw, 2) if pw > 0 else None
        worst = max(worst, ratio or 0)
        modes[name] = {
            **c,
            "prepared_first": p,
            "prepared_warm": pw,
            "prepared_over_warm": ratio,
        }
    print(
        json.dumps(
            {
                "metric": "cold_boot",
                "sf_dir": SF_DIR,
                "modes": modes,
                "prepare_total_sec": results["prepared"]["prepare_total_sec"],
                "store_prep_sec": results["prep"]["store_prep_sec"],
                "worst_prepared_over_warm": worst,
            }
        )
    )


if __name__ == "__main__":
    main()
