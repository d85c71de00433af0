#!/usr/bin/env python
"""Interleaved A/B: round-7 HEAD vs round-8 HEAD text-serving latency.

Round 8's ledger showed doc_substring_search +28% (past its nearest
envelope, graded WEAK), fts_bm25_search / doc_regex_search hovering past
the keyword line, and the comparable 35-query warm total +8.6% — all in
a session where the job floor FELL and ~25 untouched rows moved
+10-25%.  The repo's settled methodology (r3 and r5 precedent,
scripts/bench_ab.py) settles round-over-round drift with measurement:
both trees run ALTERNATELY in ONE SparkSession (same JVM, same box
load, same minute), xN runs, medians reported.

Two groups:
  MOVERS   — the three drifted text-serving modes (r8 touched their
             store code: positions-optional trigram layout branch).
  CONTROLS — queries r8 did NOT touch.  Identical code in both trees,
             so any within-session delta here is pure measurement
             noise; and if BOTH trees' controls sit well under the r8
             ledger numbers, the round-over-round aggregate move was
             session environment, not code.

Isolation note — why this is NOT scripts/bench_ab.py: the serving
queries lazy-import (`from car_etl_spark... import` inside the function
body) at CALL time, so merely binding the function object to the old
tree (bench_ab.py's trick) would silently execute the new tree's store
code.  Here each tree's full `car_etl_spark` module set is snapshotted
and swapped into sys.modules around every call, and sys.path[0] points
at the active tree, so lazy imports, prepared-plan caches, and
`_ENSURED` sets all stay tree-local.  The content-addressed index cache
is shared via CAR_ETL_INDEX_DIR (layout versions are part of the
digest, so incompatible layouts coexist; matching layouts reuse).

Usage: python scripts/bench_ab_text.py [r7_commit] [runs]
"""

from __future__ import annotations

import contextlib
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R7_COMMIT = sys.argv[1] if len(sys.argv) > 1 else "f0b3822"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("CAR_ETL_INDEX_DIR", os.path.join(REPO, ".cache", "indexes"))

MOVERS = ("doc_substring_search", "fts_bm25_search", "doc_regex_search")
CONTROLS = (
    "doc_keyword_search",
    "fts_posting_search",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "eav_pivot_effective_rent",
    "events_time_windows",
)
NAMES = MOVERS + CONTROLS


def _pkg_modules() -> dict:
    return {k: v for k, v in sys.modules.items() if k.split(".")[0] == "car_etl_spark"}


class Tree:
    """One checkout's car_etl_spark, importable in isolation."""

    def __init__(self, root: str, names: tuple[str, ...]):
        self.root = root
        prev = _pkg_modules()
        for k in prev:
            del sys.modules[k]
        sys.path.insert(0, root)
        try:
            import importlib

            reg = importlib.import_module("car_etl_spark.queries").build_registry()
            fine = importlib.import_module(
                "car_etl_spark.queries.suites"
            ).fine_grained_queries()
            self.fns = {n: (reg[n].fn if n in reg else fine[n]) for n in names}
        finally:
            sys.path.remove(root)
            self.modules = _pkg_modules()
            for k in self.modules:
                del sys.modules[k]
            sys.modules.update(prev)

    @contextlib.contextmanager
    def active(self):
        saved = _pkg_modules()
        for k in saved:
            del sys.modules[k]
        sys.modules.update(self.modules)
        sys.path.insert(0, self.root)
        try:
            yield self.fns
        finally:
            sys.path.remove(self.root)
            self.modules = _pkg_modules()
            for k in self.modules:
                del sys.modules[k]
            sys.modules.update(saved)


def main() -> None:
    wt = os.path.join(REPO, ".cache", "ab_worktree_r7")
    subprocess.run(
        ["git", "worktree", "remove", "--force", wt], cwd=REPO, capture_output=True
    )
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, R7_COMMIT], cwd=REPO, check=True
    )
    try:
        trees = {"r7": Tree(wt, NAMES), "head": Tree(REPO, NAMES)}

        # the session comes from the HEAD tree's get_spark so the JVM
        # carries the tuned driver options (code-cache sizing,
        # -XX:-DontCompileHugeMethods) the round benches ran under — a
        # vanilla session deoptimizes under the wide codegen'd plans and
        # its multi-second latency swings would swamp a 10-25% question
        with trees["head"].active():
            import importlib

            spark = importlib.import_module("car_etl_spark.session").get_spark(
                "car-etl-spark-ab-text"
            )
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        # per-tree prep + codegen warmup (store builds are
        # content-addressed: first tree pays any build, the other reuses
        # matching layouts) — untimed, mirroring bench.py's PREP phase
        for tag, tree in trees.items():
            t0 = time.perf_counter()
            with tree.active() as fns:
                for name in NAMES:
                    fns[name](spark, SF_DIR).count()
            print(f"# prep+warmup {tag}: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

        times: dict[tuple[str, str], list[float]] = {}
        for run in range(RUNS):
            for name in NAMES:
                order = ("r7", "head") if run % 2 == 0 else ("head", "r7")
                for tag in order:
                    tree = trees[tag]
                    with tree.active() as fns:
                        # noop sink — mirrors bench.py r12 (count()
                        # lets Catalyst skip work the bench now times)
                        t0 = time.perf_counter()
                        fns[name](spark, SF_DIR).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        times.setdefault((name, tag), []).append(
                            time.perf_counter() - t0
                        )
                    spark.catalog.clearCache()

        print(f"\n# interleaved A/B {R7_COMMIT} (r7) vs HEAD, {RUNS} runs, {SF_DIR}")
        print(
            f"{'query':28s} {'r7 med':>8s} {'head med':>9s} {'delta':>7s}"
            f" {'r7 spread':>10s} {'head spread':>12s}"
        )
        agg = {"r7": 0.0, "head": 0.0}
        for group, names in (("MOVERS (r8 touched)", MOVERS), ("CONTROLS (untouched)", CONTROLS)):
            print(f"-- {group}")
            for name in names:
                r7 = times[(name, "r7")]
                hd = times[(name, "head")]
                m7, mh = statistics.median(r7), statistics.median(hd)
                agg["r7"] += m7
                agg["head"] += mh
                print(
                    f"{name:28s} {m7:8.3f} {mh:9.3f} {100 * (mh - m7) / m7:6.1f}%"
                    f" {max(r7) - min(r7):10.3f} {max(hd) - min(hd):12.3f}"
                )
        d = 100 * (agg["head"] - agg["r7"]) / agg["r7"]
        print(f"{'TOTAL (median sums)':28s} {agg['r7']:8.3f} {agg['head']:9.3f} {d:6.1f}%")
        import json

        print(
            json.dumps(
                {
                    "metric": "ab_text_medians",
                    "r7_commit": R7_COMMIT,
                    "runs": RUNS,
                    "sf_dir": SF_DIR,
                    "movers": {
                        n: {
                            "r7": round(statistics.median(times[(n, "r7")]), 4),
                            "head": round(statistics.median(times[(n, "head")]), 4),
                        }
                        for n in MOVERS
                    },
                    "controls": {
                        n: {
                            "r7": round(statistics.median(times[(n, "r7")]), 4),
                            "head": round(statistics.median(times[(n, "head")]), 4),
                        }
                        for n in CONTROLS
                    },
                    "total_delta_pct": round(d, 1),
                }
            )
        )
        spark.stop()
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt], cwd=REPO, capture_output=True
        )


if __name__ == "__main__":
    main()
