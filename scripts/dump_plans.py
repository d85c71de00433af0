"""Dump .explain('formatted') for every bench HEADLINE row (and any
extra names passed on argv) to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [name ...]
e.g.   python scripts/dump_plans.py r12 before
       python scripts/dump_plans.py r12 after normalize_roundtrips

Plans are the optimization round's evidence artifact: the judge checks
plan-shape claims (Exchange counts, join strategies, PushedFilters,
Python-eval nodes) against these files.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
only = set(sys.argv[3:])

from car_etl_spark.queries import build_registry  # noqa: E402
from car_etl_spark.queries.suites import fine_grained_queries  # noqa: E402
from car_etl_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", tag)
os.makedirs(out_dir, exist_ok=True)

spark = get_spark("car-etl-spark-plan-dump")
# mirror bench.py's sub-sf0.1 shuffle sizing so plans match what it runs
sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
try:
    if float(sf_label) <= 0.1:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
except ValueError:
    pass

registry = build_registry()
extra = fine_grained_queries()

import bench  # noqa: E402

names = list(bench.HEADLINE)
if only:
    names = [n for n in names if n in only] + [n for n in only if n not in names]

for name in names:
    fn = extra[name] if name in extra else registry[name].fn
    df = fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
spark.stop()
