import os, shutil, statistics, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from car_etl_spark.operators import similarity as S
from car_etl_spark.session import get_spark
from car_etl_spark.streaming import incremental_dedup as I

N_STORE = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
spark = get_spark("banded-synth")

sig_path = "/tmp/synth_sigs.parquet"; band_path = "/tmp/synth_banded.parquet"
for p in (sig_path, band_path): shutil.rmtree(p, ignore_errors=True)
# synthetic signatures: 48 deterministic pseudo-random longs per doc
sig = F.array(*[F.xxhash64(F.col("id"), F.lit(i)) for i in range(S.DEFAULT_NUM_HASHES)])
spark.range(N_STORE).select(F.col("id").alias("doc_id"), sig.alias("sig")).write.parquet(sig_path)
store = spark.read.parquet(sig_path)
(S.banded_signatures(store, "doc_id", S.DEFAULT_BANDS, S.DEFAULT_NUM_HASHES)
 .withColumn("bmod", I._bmod("bucket"))
 .write.partitionBy("band", "bmod").parquet(band_path))
print(f"# store {store.count()} sigs", flush=True)

class FD: banded = I.IncrementalDeduper.banded
fd = FD(); fd.band_path = band_path; fd.spark = spark; fd.params = {}

# batch: 50 new docs with ids beyond the store
batch_sigs = (spark.range(N_STORE, N_STORE + 50)
              .select(F.col("id").alias("doc_id"), sig.alias("sig"))).localCheckpoint(eager=True)
new_b0 = S.banded_signatures(batch_sigs, "doc_id", S.DEFAULT_BANDS, S.DEFAULT_NUM_HASHES)

def probe(all_b):
    nb = F.broadcast(new_b0)
    cand = (nb.alias("a").join(all_b.alias("b"),
            (F.col("a.band")==F.col("b.band")) & (F.col("a.bucket")==F.col("b.bucket"))
            & (F.col("a.doc_id")!=F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")).distinct())
    return cand

variants = {
    "reband_union": lambda: probe(S.banded_signatures(store.unionByName(batch_sigs), "doc_id", S.DEFAULT_BANDS, S.DEFAULT_NUM_HASHES)),
    "banded_pruned": lambda: probe(fd.banded(new_b0).select("doc_id","band","bucket").unionByName(new_b0)),
}
times = {k: [] for k in variants}
for r in range(RUNS + 1):
    for vn, fn in variants.items():
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if r > 0: times[vn].append(dt)
for vn, ts in times.items():
    print(f"{vn}: median {statistics.median(ts):.3f}s ({['%.2f'%t for t in ts]})", flush=True)
spark.stop()
