"""Local replica of the external driver's correctness gate: entry()
smoke + every queries() entry vs its DuckDB oracle at sf0.01."""
import importlib
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
m = importlib.import_module("__spark_entry__")

t0 = time.time()
rows = m.entry(spark).collect()
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s")

from car_etl_spark.oracle import compare  # noqa: E402

qs = m.queries()
if SF_DIR == m.DRIVER_ORACLE_SF_DIR:
    osql = m.oracle_sql()
else:
    # callable oracles embed corpus-derived artifacts (e.g. the BPE
    # merge table materialized from the corpus); resolve them ONCE for
    # the dir actually under test — calling m.oracle_sql() first would
    # build the driver-default dir's artifacts and throw them away (or
    # crash when that dir doesn't exist on this machine)
    from car_etl_spark.queries import build_registry, resolve_oracle  # noqa: E402

    osql = {
        name: resolve_oracle(spec.oracle, SF_DIR)
        for name, spec in build_registry().items()
        if spec.oracle is not None
    }
print(f"{len(qs)} queries, {len(osql)} oracles")
failed = []
for name, fn in qs.items():
    sql = osql.get(name)
    t0 = time.time()
    if sql is None:
        try:
            n = fn(spark, SF_DIR).count()
            print(f"  {name}: rows-only {n} rows ({time.time()-t0:.1f}s)")
        except Exception as e:
            failed.append(name)
            print(f"  {name}: ROWS-ONLY FAILED {e}")
        continue
    try:
        r = compare(name, spark, SF_DIR, fn, sql)
    except Exception as e:
        failed.append(name)
        print(f"  {name}: EXC {e}")
        continue
    if r.ok:
        print(f"  {name}: OK {r.spark_rows} rows ({time.time()-t0:.1f}s)")
    else:
        failed.append(name)
        print(f"  {name}: FAIL {r.detail}")
print(f"\n{'ALL GREEN' if not failed else 'FAILED: ' + ', '.join(failed)} "
      f"({len(qs) - len(failed)}/{len(qs)})")
sys.exit(1 if failed else 0)
