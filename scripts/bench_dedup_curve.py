"""Dedup-cost scale curve: the candidates-∝-duplicates evidence.

The 100 TB claim for MinHash/LSH dedup (ARCHITECTURE.md "Text dedup")
is that the band join's candidate set tracks TRUE near-duplicates, not
corpus size squared — uniform band-hash keys, bounded bucket loads, and
exact-Jaccard verification that touches candidates only.  This script
generates synthetic corpora growing 64x (5k -> 320k docs, 40
hash-derived tokens each) with a CONSTANT planted twin rate (1 near-dup
per 50 docs, Jaccard ~0.85), runs the production
``minhash_near_duplicates`` end to end, and reports per size:

- wall seconds (expect ~linear in n: flat wall/n once fixed
  overheads amortize — the anti-quadratic property),
- LSH candidate pairs and candidates/doc (expect FLAT candidates/doc:
  candidates ∝ planted dups ∝ n, never n²),
- planted-twin recall through the full pipeline (expect 1.0: twins
  share 37/41 shingles, far above the 0.5 threshold and the 12x4
  banding knee).

Corpora land under the repo's gitignored ``.cache/`` scratch; re-runs
reuse them.  Usage: python scripts/bench_dedup_curve.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from car_etl_spark.operators.similarity import (  # noqa: E402
    exploded_shingle_rows,
    lsh_candidate_pairs,
    minhash_from_exploded,
    minhash_near_duplicates,
)
from car_etl_spark.session import get_spark  # noqa: E402

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "dedupcurve"
)
DOC_SIZES = (5_000, 20_000, 80_000, 320_000)
TOKENS_PER_DOC = 40
TWIN_EVERY = 50


def timed(fn, runs: int = 3) -> float:
    vals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return round(min(vals), 4)


def make_docs(spark, n: int) -> str:
    """Spark-side corpus generation (no driver materialization): doc i
    holds 40 hash-derived tokens over a vocabulary ∝ n (uniform hashes,
    so unrelated docs share almost no shingles), plus one planted twin
    per TWIN_EVERY base docs — the twin of doc i is doc n+i with the
    last token replaced, sharing 37 of its 41 3-gram shingles
    (Jaccard ~0.85).  The scaling variable is corpus volume alone; the
    true-duplicate RATE is constant."""
    path = os.path.join(ROOT, f"docs-{n}", "documents.parquet")
    if os.path.isdir(path):
        return path
    vocab = max(n // 5, 1_000)

    def tok(key_col, j):
        return F.concat(
            F.lit("w"), F.pmod(F.xxhash64(key_col, j), F.lit(vocab)).cast("string")
        )

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
                lambda j: tok(F.col("id"), j),
            ),
        ).alias("text"),
    )
    twins = spark.range(0, n, TWIN_EVERY).select(
        (F.col("id") + F.lit(n)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(
                F.transform(
                    F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 2)),
                    lambda j: tok(F.col("id"), j),
                ),
                F.array(F.lit("zzedited")),
            ),
        ).alias("text"),
    )
    base.unionByName(twins).repartition(32).write.parquet(path)
    return path


def main() -> None:
    spark = get_spark("bench-dedup-curve")
    out = []
    for n in DOC_SIZES:
        docs = spark.read.parquet(make_docs(spark, n))
        planted = n // TWIN_EVERY

        sigs = minhash_from_exploded(exploded_shingle_rows(docs))
        candidates = lsh_candidate_pairs(sigs).count()

        wall = timed(lambda: minhash_near_duplicates(docs).count())
        found = minhash_near_duplicates(docs)
        recovered = found.filter(F.col("id_b") - F.col("id_a") == n).count()
        total_found = found.count()

        row = {
            "docs": n + planted,
            "wall_sec": wall,
            "wall_per_1k_docs": round(wall / ((n + planted) / 1000), 4),
            "candidates": candidates,
            "cand_per_doc": round(candidates / (n + planted), 4),
            "planted": planted,
            "recovered": recovered,
            "recall": round(recovered / planted, 4),
            "found_total": total_found,
        }
        out.append(row)
        print(f"# {row}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
