#!/usr/bin/env python
"""Interleaved A/B benchmark: round-2 code vs current HEAD, one session.

Round 3's bench total regressed ~12% vs round 2 on queries round 3 did
NOT touch, which box-load variance would explain — this script settles
it with measurement instead of assertion: both implementations of the
five biggest movers run ALTERNATELY in the same SparkSession (same JVM,
same box load, same minute), x N runs, medians reported.  If the
within-session medians agree, the round-over-round delta was
environment; if they differ, the regressing commit is real.

Usage: python scripts/bench_ab.py [r2_commit] [runs]
Needs: git worktree of the r2 commit (created/removed automatically in
.cache/ab_worktree).
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R2_COMMIT = sys.argv[1] if len(sys.argv) > 1 else "67af522"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: override with AB_MOVERS=a,b,c to point the harness at the round's
#: disputed rows without editing the script
MOVERS = tuple(
    s.strip()
    for s in os.environ.get(
        "AB_MOVERS",
        "customer_order_versioning,q3_shipping_priority,normalize_roundtrips,"
        "flagship_portfolio_rollup,cdc_apply_tombstones",
    ).split(",")
    if s.strip()
)


def import_registry_fns(root: str, names: tuple[str, ...]):
    """Import car_etl_spark from ``root`` in isolation and return the
    named query fns (their module globals stay bound to that tree)."""
    saved = {k: v for k, v in sys.modules.items() if k.split(".")[0] == "car_etl_spark"}
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, root)
    try:
        import importlib

        reg = importlib.import_module("car_etl_spark.queries").build_registry()
        # fine-grained names WIN over registry names, mirroring
        # bench.py's resolve(): when a consolidation folds extra work
        # into a registry row of the same name (r11:
        # doc_exact_dedup_stats gained the closure arm), the A/B must
        # time the comparable plain form on BOTH trees — guarded, since
        # old baseline trees predate queries/suites entirely
        fine = {}
        try:
            fine = importlib.import_module(
                "car_etl_spark.queries.suites"
            ).fine_grained_queries()
        except ImportError:
            pass
        return {n: (fine[n] if n in fine else reg[n].fn) for n in names}
    finally:
        sys.path.remove(root)
        for k in [k for k in sys.modules if k.split(".")[0] == "car_etl_spark"]:
            del sys.modules[k]
        sys.modules.update(saved)


def main() -> None:
    wt = os.path.join(REPO, ".cache", "ab_worktree")
    subprocess.run(
        ["git", "worktree", "remove", "--force", wt], cwd=REPO, capture_output=True
    )
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, R2_COMMIT], cwd=REPO, check=True
    )
    try:
        old_fns = import_registry_fns(wt, MOVERS)
        new_fns = import_registry_fns(REPO, MOVERS)

        from car_etl_spark.session import get_spark

        spark = get_spark("car-etl-spark-ab")
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        # JVM/codegen warmup on both trees
        for fns in (old_fns, new_fns):
            fns[MOVERS[0]](spark, SF_DIR).count()

        times: dict[tuple[str, str], list[float]] = {}
        for run in range(RUNS):
            for name in MOVERS:
                # alternate which side goes first to cancel drift
                order = (("r2", old_fns), ("head", new_fns))
                if run % 2:
                    order = order[::-1]
                for tag, fns in order:
                    # noop sink, mirroring bench.py's r12 methodology
                    # (count() lets Catalyst skip aggregate exprs and
                    # eliminable joins — the A/B must time the same
                    # work the bench times)
                    t0 = time.perf_counter()
                    fns[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    times.setdefault((name, tag), []).append(time.perf_counter() - t0)
                    spark.catalog.clearCache()

        print(f"\n# interleaved A/B {R2_COMMIT} (r2) vs HEAD, {RUNS} runs, {SF_DIR}")
        print(f"{'query':32s} {'r2 med':>8s} {'head med':>9s} {'delta':>7s} {'r2 spread':>10s}")
        for name in MOVERS:
            r2 = times[(name, "r2")]
            hd = times[(name, "head")]
            m2, mh = statistics.median(r2), statistics.median(hd)
            spread = max(r2) - min(r2)
            print(
                f"{name:32s} {m2:8.3f} {mh:9.3f} {100 * (mh - m2) / m2:6.1f}% {spread:10.3f}"
            )
        spark.stop()
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt], cwd=REPO, capture_output=True
        )


if __name__ == "__main__":
    main()
