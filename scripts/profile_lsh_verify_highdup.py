#!/usr/bin/env python
"""Demonstrate the r12 §10a LSH verify-stage fix at a scale where it
separates from noise (r12 verdict item 4).

The fix: the per-candidate shingle payload is built ONCE and
localCheckpointed (it feeds both pair sides), and the candidate-id
semi-join is broadcast-gated by the true candidate count.  The before
shape built the scan -> semi-join -> shingle subtree once PER PAIR SIDE
and planned the semi-join as SortMergeJoin (full corpus exchange+sort,
twice).  At sf0.1/sf1 the corpus makes near-dup output sparse by
design, so the re-executed subtree was one small scan — invisible under
session spread.  This script synthesizes a HIGH-DUPLICATION corpus
(every base doc has two ~98%-overlap near-copies, so candidates cover
the whole corpus and the verify stage dominates), asserts output
parity, and times the two shapes interleaved.

Usage: python scripts/profile_lsh_verify_highdup.py [n_base] [runs]
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

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
DOC_TOKENS = 60
VOCAB = 5000


def main() -> None:
    spark = get_spark("profile-lsh-verify-highdup")
    path = "/tmp/lsh_highdup_docs.parquet"
    shutil.rmtree(path, ignore_errors=True)
    # 3 docs per base: the original (copy 0) and two near-copies that
    # each perturb ONE token position -> 3-shingle jaccard ~0.9
    base = F.col("id") % N_BASE
    copy = (F.col("id") / N_BASE).cast("int")
    tok = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(base * 2654435761 + F.lit(j * 40503), F.lit(VOCAB)).cast("string"),
    )
    perturb_pos = F.pmod(base + copy * 17, F.lit(DOC_TOKENS))
    words = F.array(*[
        F.when((copy > 0) & (perturb_pos == j), F.concat(F.lit("zz"), copy.cast("string")))
        .otherwise(tok(j))
        for j in range(DOC_TOKENS)
    ])
    (
        spark.range(3 * N_BASE)
        .select(F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text"))
        .write.parquet(path)
    )
    docs = spark.read.parquet(path)
    print(f"# corpus {docs.count()} docs ({N_BASE} bases x 3)", flush=True)

    def before_shape():
        """The pre-1f9fa90 verify: shingle subtree PER SIDE, unhinted
        candidate semi-join (plans as SMJ over the full corpus)."""
        sigs = S.minhash_from_exploded(
            S.exploded_shingle_rows(docs, "text", 3, "doc_id"),
            S.DEFAULT_NUM_HASHES, "doc_id",
        )
        candidates = S.lsh_candidate_pairs(
            sigs, "doc_id", S.DEFAULT_BANDS, S.DEFAULT_NUM_HASHES
        ).localCheckpoint(eager=True)
        ids = candidates.select(F.col("id_a").alias("doc_id")).unionByName(
            candidates.select(F.col("id_b").alias("doc_id"))
        ).distinct()
        sh_a = S.with_shingles(
            docs.join(ids, "doc_id", "left_semi"), "text", 3, "doc_id"
        ).select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
        sh_b = S.with_shingles(
            docs.join(ids, "doc_id", "left_semi"), "text", 3, "doc_id"
        ).select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
        return (
            candidates.join(sh_a, "id_a")
            .join(sh_b, "id_b")
            .select(
                "id_a", "id_b",
                F.round(S.exact_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.5)
        )

    shipped = lambda: S.minhash_near_duplicates(docs, "text", "doc_id", threshold=0.5)  # noqa: E731

    a = shipped(); b = before_shape()
    n = a.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print(f"# parity OK ({n} pairs — candidates cover the corpus)", flush=True)

    variants = {"before(2 subtrees, SMJ semi-join)": before_shape, "shipped(r12 §10a)": shipped}
    times = {k: [] for k in variants}
    for r in range(RUNS + 1):
        for vn, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{vn} run{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if r > 0:
                times[vn].append(dt)
            print(f"#   run{r} {vn}: {dt:.3f}s", flush=True)
    for vn, ts in times.items():
        print(f"{vn}: median {statistics.median(ts):.3f}s ({['%.2f' % t for t in ts]})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
