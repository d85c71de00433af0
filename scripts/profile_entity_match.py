"""Per-stage / per-plan-node attribution of entity_match_modes at sf1
(the r10 dedup profiling playbook, applied to the r10 verdict's largest
unattributed soak row).

Runs the suite cold+warm on the sf1 replica corpus with the Spark UI
enabled, then reads the status REST API: stage ``executorRunTime``
deltas for the warm run, and the SQL node metrics of the warm
execution, mapping hot codegen spans to operators via the plan
description.  Prints a JSON attribution blob.

Usage: python scripts/profile_entity_match.py [query_name]
  query_name: entity_match_modes (default) | entity_match_blocked |
              entity_match_lsh_extended | any registry/fine name
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".cache", "sf1.0")


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "entity_match_modes"
    from car_etl_spark.session import get_spark

    spark = get_spark(
        "entity-match-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    from car_etl_spark.queries import build_registry
    from car_etl_spark.queries.suites import fine_grained_queries

    registry = build_registry()
    fn = registry[name].fn if name in registry else fine_grained_queries()[name]

    ui = spark.sparkContext.uiWebUrl
    app = _get(f"{ui}/api/v1/applications")[0]["id"]

    # cold run (codegen compile), then snapshot stage set, then warm run
    t0 = time.perf_counter()
    fn(spark, SF1).count()
    cold = time.perf_counter() - t0
    pre = {s["stageId"] for s in _get(f"{ui}/api/v1/applications/{app}/stages")}
    t0 = time.perf_counter()
    n = fn(spark, SF1).count()
    warm = time.perf_counter() - t0

    stages = [
        s
        for s in _get(f"{ui}/api/v1/applications/{app}/stages")
        if s["stageId"] not in pre and s["status"] == "COMPLETE"
    ]
    total_exec = sum(s["executorRunTime"] for s in stages) or 1
    top_stages = sorted(stages, key=lambda s: -s["executorRunTime"])[:12]
    stage_rows = [
        {
            "stage": s["stageId"],
            "exec_ms": s["executorRunTime"],
            "share": round(s["executorRunTime"] / total_exec, 3),
            "tasks": s["numCompleteTasks"],
            "input_rows": s.get("inputRecords", 0),
            "shuffle_read_rows": s.get("shuffleReadRecords", 0),
            "shuffle_write_rows": s.get("shuffleWriteRecords", 0),
            "desc": (s.get("description") or s.get("name", ""))[:160],
        }
        for s in top_stages
    ]

    # SQL node metrics of the LAST (warm) execution
    sqls = _get(f"{ui}/api/v1/applications/{app}/sql?details=true&length=200")
    warm_sql = max(sqls, key=lambda q: q["id"])
    time_metrics = (
        "duration", "scan time", "sort time", "op time", "join time",
        "time in aggregation build", "time to build hash map",
        "aggregate time", "build time",
    )

    def _ms(v: str) -> int:
        # "221 ms" | "1.2 s" | "total (min, med, max ...)\n60 ms (...)"
        if "\n" in v:
            v = v.split("\n", 1)[1]
        head = v.split("(")[0].strip()
        try:
            num, unit = head.split()
            mult = {"ms": 1, "s": 1000, "m": 60000, "h": 3600000}[unit]
            return int(float(num.replace(",", "")) * mult)
        except (ValueError, KeyError):
            return 0

    nodes = []
    for nd in warm_sql.get("nodes", []):
        t_ms = 0
        rows = None
        for m in nd.get("metrics", []):
            nm, v = m["name"], m["value"]
            if nm in time_metrics:
                t_ms = max(t_ms, _ms(v))
            if nm == "number of output rows":
                rows = int(v.replace(",", ""))
        nodes.append(
            {
                "node": nd["nodeName"][:60],
                "id": nd["nodeId"],
                "op_ms": t_ms,
                "out_rows": rows,
            }
        )
    nodes.sort(key=lambda x: -x["op_ms"])

    out = {
        "query": name,
        "sf_dir": SF1,
        "rows": n,
        "cold_sec": round(cold, 2),
        "warm_sec": round(warm, 2),
        "warm_executor_total_ms": total_exec,
        "top_stages": stage_rows,
        "top_sql_nodes": nodes[:20],
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
