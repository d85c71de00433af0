#!/usr/bin/env python
"""Per-batch profile of the r13 BANDED signature store experiment
(incremental dedup) — MEASURED AND DECLINED; the layout was reverted
and this script + profile_banded_store_synth.py are the evidence.

The idea (r12 verdict item 5): persist the store's (id, band, bucket)
rows partitioned by (band, xxhash(bucket) % 64) so a drop's candidate
probe prunes to its own cells instead of re-banding the full signature
store per batch.  Three measurements, all against the shipped
re-band-the-union probe (pair parity asserted first):

- real 49k-doc store, 2k/50-doc drops: banded store 4-5x SLOWER
  (1.85 -> 9.09 s and 2.23 -> 7.31 s medians) — 768-way partitioned
  appends produce a tiny-file storm and per-probe listing dominates;
- synthetic 1M-doc store, 50-doc drop: 2.49 -> 9.63 s (same mechanism);
- same store COMPACTED to exactly one file per cell: still 2.57 ->
  4.51 s pruned / 4.12 s full — even with zero file overhead to
  amortize away, the 12x row-multiplied banded materialization reads
  no fewer bytes than ONE compact signature scan + codegen banding,
  and LSH buckets are uniform so a D-doc drop hits ~min(768, 12*D)
  of 768 cells: pruning only bites for D << 64, i.e. single-document
  lookups against 10^9-doc stores — not a per-batch ingest win at any
  scale this box can demonstrate.

Kept as the ledger artifact; re-run if the serving side ever needs
single-doc membership probes, where the cell math does work out.

Usage: python scripts/profile_banded_store.py [store_docs] [runs]
Data: documents from $SPARK_GRAFT_SF_DIR (default .cache/sf1.0).
NOTE: requires the (reverted) store_banded/precomputed_sigs hooks in
streaming/incremental_dedup.py — see git history at the r13 round.
"""
from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from car_etl_spark.operators import similarity as S  # noqa: E402
from car_etl_spark.session import get_spark  # noqa: E402
from car_etl_spark.streaming import incremental_dedup as I  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.cache/sf1.0")
STORE_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 140_000
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    spark = get_spark("profile-banded-store")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    store_docs = docs.filter(F.col("doc_id") % 100 < 98)
    rest = docs.filter(F.col("doc_id") % 100 >= 98)
    batches = {
        "drop2000": rest.limit(2000).localCheckpoint(eager=True),
        "drop50": rest.limit(50).localCheckpoint(eager=True),
    }

    sig_path = "/tmp/banded_profile_sigs.parquet"
    band_path = "/tmp/banded_profile_banded.parquet"
    for p in (sig_path, band_path):
        shutil.rmtree(p, ignore_errors=True)
    sigs = S.minhash_from_exploded(
        S.exploded_shingle_rows(store_docs, "text", 3, "doc_id"),
        S.DEFAULT_NUM_HASHES, "doc_id",
    )
    sigs.write.parquet(sig_path)
    store = spark.read.parquet(sig_path)
    (
        S.banded_signatures(store, "doc_id", S.DEFAULT_BANDS, S.DEFAULT_NUM_HASHES)
        .withColumn("bmod", I._bmod("bucket"))
        .write.partitionBy("band", "bmod").parquet(band_path)
    )
    print(f"# store {store.count()} sigs; banded store written", flush=True)

    class FakeDeduper:
        banded = I.IncrementalDeduper.banded

    fd = FakeDeduper()
    fd.band_path = band_path
    fd.spark = spark
    fd.params = {}

    def banded_probe(batch):
        sigs_new = S.minhash_from_exploded(
            S.exploded_shingle_rows(batch, "text", 3, "doc_id"),
            S.DEFAULT_NUM_HASHES, "doc_id",
        ).localCheckpoint(eager=True)
        new_b = S.banded_signatures(sigs_new, "doc_id", S.DEFAULT_BANDS, S.DEFAULT_NUM_HASHES)
        pruned = fd.banded(new_b)
        return I.dedup_batch(batch, store, store_banded=pruned, precomputed_sigs=sigs_new)[0]

    # parity gate on both drops
    for name, batch in batches.items():
        a = I.dedup_batch(batch, store)[0]
        b = banded_probe(batch)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name
        print(f"# parity OK {name} ({a.count()} pairs)", flush=True)

    for name, batch in batches.items():
        variants = {
            f"{name}:reband_union": lambda b=batch: I.dedup_batch(b, store)[0],
            f"{name}:banded_store": lambda b=batch: banded_probe(b),
        }
        times = {k: [] for k in variants}
        for r in range(RUNS + 1):
            for vn, fn in variants.items():
                spark.sparkContext.setJobDescription(f"{vn} run{r}")
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if r > 0:
                    times[vn].append(dt)
        for vn, ts in times.items():
            print(f"{vn}: median {statistics.median(ts):.3f}s  ({['%.3f' % t for t in ts]})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
