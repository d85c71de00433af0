#!/usr/bin/env python
"""Profile the per-micro-batch cost of incremental MinHash dedup.

The r12 plan-dump sweep never covered the streaming paths (§9.3 of
OPTIMIZATION_r12.md).  Reading `dedup_batch`'s plan shows THREE
full-store passes per micro-batch where one suffices:

1. the band join shuffles the banded STORE (bands rows per corpus doc)
   because the small new-batch side is an un-broadcast checkpoint RDD
   (ExistingRDD stats = huge -> SortMergeJoin, both sides exchanged);
2. the `sa` signature-attach join scans+shuffles the full union even
   though `id_a` is always a NEW-batch id (the band join's left side);
3. the `sb` attach scans+shuffles the full union for a candidate-
   bounded id set.

This script times the shipped `dedup_batch` against the r12-previous
shape (reconstructed inline below), asserting PAIR PARITY first —
both variants must emit the identical (id_a, id_b, est_jaccard) set.

Usage: python scripts/profile_incremental_dedup.py [store_docs] [batch_docs] [runs]
Data: documents from $SPARK_GRAFT_SF_DIR (default .cache/sf1.0 — run
scripts/soak_sf1.py's synthesize step first for the 150k-doc corpus).
"""

from __future__ import annotations

import os
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
BATCH_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 5


def dedup_batch_r12prev(new_docs, store_sigs, id_col="doc_id", threshold=0.5,
                        shingle_n=3, num_hashes=S.DEFAULT_NUM_HASHES,
                        bands=S.DEFAULT_BANDS):
    """The pre-optimization shape, verbatim from commit ebd03ce."""
    sigs_new = S.minhash_from_exploded(
        S.exploded_shingle_rows(new_docs, "text", shingle_n, id_col),
        num_hashes, id_col,
    ).localCheckpoint(eager=True)
    union = sigs_new if store_sigs is None else store_sigs.unionByName(sigs_new)
    new_b = S.banded_signatures(sigs_new, id_col, bands, num_hashes)
    all_b = S.banded_signatures(union, id_col, bands, num_hashes)
    new_ids = sigs_new.select(F.col(id_col).alias("id_b"), F.lit(True).alias("__new_b"))
    cand = (
        new_b.alias("a")
        .join(
            all_b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .join(F.broadcast(new_ids), "id_b", "left")
        .filter(~F.coalesce(F.col("__new_b"), F.lit(False)) | (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = union.select(F.col(id_col).alias("id_a"), F.col("sig").alias("__sa"))
    sb = union.select(F.col(id_col).alias("id_b"), F.col("sig").alias("__sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b",
                F.round(I.estimated_jaccard(F.col("__sa"), F.col("__sb")), 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def main() -> None:
    spark = get_spark()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    store_docs = docs.filter(F.col("doc_id") % 100 < (100 * STORE_DOCS) // (STORE_DOCS + BATCH_DOCS))
    batch_docs = docs.subtract(store_docs).limit(BATCH_DOCS).localCheckpoint(eager=True)

    store_path = "/tmp/incdedup_profile_store.parquet"
    import shutil

    shutil.rmtree(store_path, ignore_errors=True)
    S.minhash_from_exploded(
        S.exploded_shingle_rows(store_docs, "text", 3, "doc_id"), S.DEFAULT_NUM_HASHES, "doc_id"
    ).write.parquet(store_path)
    store = spark.read.parquet(store_path)
    n_store = store.count()
    n_batch = batch_docs.count()
    print(f"# store {n_store} sigs, batch {n_batch} docs", flush=True)

    # --- parity gate ------------------------------------------------------
    new_pairs, _ = I.dedup_batch(batch_docs, store)
    old_pairs = dedup_batch_r12prev(batch_docs, store)
    d1 = new_pairs.exceptAll(old_pairs).count()
    d2 = old_pairs.exceptAll(new_pairs).count()
    assert d1 == 0 and d2 == 0, f"PARITY FAILED: new-old={d1} old-new={d2}"
    print(f"# parity OK ({new_pairs.count()} pairs both variants)", flush=True)

    def build_variant(broadcast_new: bool, sa_from_new: bool, sb_semi: bool):
        id_col, bands, num_hashes, threshold = "doc_id", S.DEFAULT_BANDS, S.DEFAULT_NUM_HASHES, 0.5
        sigs_new = S.minhash_from_exploded(
            S.exploded_shingle_rows(batch_docs, "text", 3, id_col), num_hashes, id_col
        ).localCheckpoint(eager=True)
        union = store.unionByName(sigs_new)
        new_b = S.banded_signatures(sigs_new, id_col, bands, num_hashes)
        if broadcast_new and sigs_new.count() * bands <= I.NEW_BAND_BROADCAST_MAX:
            new_b = F.broadcast(new_b)
        all_b = S.banded_signatures(union, id_col, bands, num_hashes)
        new_ids = sigs_new.select(F.col(id_col).alias("id_b"), F.lit(True).alias("__new_b"))
        cand = (
            new_b.alias("a")
            .join(
                all_b.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
            )
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .join(F.broadcast(new_ids), "id_b", "left")
            .filter(~F.coalesce(F.col("__new_b"), F.lit(False)) | (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b")
            .distinct()
        )
        if sb_semi:
            cand = cand.localCheckpoint(eager=True)
            ids_b = cand.select(F.col("id_b").alias(id_col)).distinct()
            if cand.count() <= S.CAND_ID_BROADCAST_MAX // 2:
                ids_b = F.broadcast(ids_b)
            sb = (
                union.join(ids_b, id_col, "left_semi")
                .select(F.col(id_col).alias("id_b"), F.col("sig").alias("__sb"))
            )
        else:
            sb = union.select(F.col(id_col).alias("id_b"), F.col("sig").alias("__sb"))
        src_a = sigs_new if sa_from_new else union
        sa = src_a.select(F.col(id_col).alias("id_a"), F.col("sig").alias("__sa"))
        return (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .select("id_a", "id_b",
                    F.round(I.estimated_jaccard(F.col("__sa"), F.col("__sb")), 6).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold)
        )

    variants = {
        "A:prev(3 passes)": lambda: dedup_batch_r12prev(batch_docs, store),
        "shipped(dedup_batch)": lambda: I.dedup_batch(batch_docs, store)[0],
    }
    if os.environ.get("INCDEDUP_ALL_VARIANTS"):
        variants.update({
            "B:sa_from_new": lambda: build_variant(False, True, False),
            "C:B+sb_semi": lambda: build_variant(False, True, True),
            "D:C+bcast_new_b": lambda: build_variant(True, True, True),
        })
    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(RUNS + 1):  # +1 cold pass, dropped
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"incdedup {name} run{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if r > 0:
                times[name].append(dt)
            print(f"#   run{r} {name}: {dt:.3f}s", flush=True)
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s  ({['%.3f' % t for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
