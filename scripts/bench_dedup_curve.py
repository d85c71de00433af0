"""Dedup-cost scale curves for all three near-dup families.

The 100 TB claim for the dedup pillar (ARCHITECTURE.md "Text dedup")
is that candidate volume tracks TRUE near-duplicates, not corpus size
squared — uniform band/subset keys, scale-derived key widths, and
exact verification that touches candidates only.  This script grows
synthetic corpora 64x with a CONSTANT planted twin rate and runs the
PRODUCTION operators end to end:

- **MinHash/LSH** (`minhash_near_duplicates`): 5k -> 320k docs of 40
  hash-derived tokens; twins share 37/41 3-gram shingles (J ~0.85).
- **SimHash** (`simhash_near_duplicates`, plan from
  `simhash_blocking_plan(n)`): same corpora; twins differ in one
  token so their fingerprints sit a few bits apart.
- **Embedding LSH** (`embedding_near_duplicates`, plan from
  `embedding_lsh_plan(n, 0.9)`): 2k -> 128k 32-dim hash-derived
  vectors; twins are one-component nudges (cosine ~0.999), unrelated
  vectors concentrate at cosine ~0 ± 1/sqrt(32).

Per size and family: wall seconds (expect ~linear in n — flat wall/n
once fixed overheads amortize), candidate pairs and candidates/doc
(expect flat-ish candidates/doc: ∝ planted dups plus the planned O(1)
bucket load, never n²), and planted-twin recall (expect 1.0 for the
pigeonhole/verified configurations).

Corpora land under the repo's gitignored ``.cache/`` scratch; re-runs
reuse them.  Usage: python scripts/bench_dedup_curve.py [minhash|simhash|embedding ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from car_etl_spark.operators.similarity import (  # noqa: E402
    embedding_lsh_plan,
    embedding_near_duplicates,
    exploded_shingle_rows,
    lsh_candidate_pairs,
    minhash_from_exploded,
    minhash_near_duplicates,
    simhash_blocked_candidates,
    simhash_blocking_plan,
    simhash_fingerprints,
    simhash_near_duplicates,
)
from car_etl_spark.session import get_spark  # noqa: E402

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "dedupcurve"
)
DOC_SIZES = (5_000, 20_000, 80_000, 320_000)
TOKENS_PER_DOC = 40
TWIN_EVERY = 50
VEC_SIZES = (2_000, 16_000, 128_000)
VEC_DIM = 32
MAX_HAMMING = 6


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


def make_vectors(spark, n: int) -> str:
    """Hash-derived 32-dim vectors, components uniform in [-1, 1]; one
    planted twin per TWIN_EVERY base vectors, nudging component 0 by
    +0.05 (cosine vs base ~0.999; unrelated pairs concentrate at
    ~0 ± 1/sqrt(dim))."""
    path = os.path.join(ROOT, f"vecs-{n}", "embeddings.parquet")
    if os.path.isdir(path):
        return path

    def comp(key_col, j):
        return (
            (F.pmod(F.xxhash64(key_col, j), F.lit(2001)) - F.lit(1000)) / F.lit(1000.0)
        ).cast("float")

    dims = F.sequence(F.lit(0), F.lit(VEC_DIM - 1))
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(dims, lambda j: comp(F.col("id"), j)).alias("embedding"),
    )
    twins = spark.range(0, n, TWIN_EVERY).select(
        (F.col("id") + F.lit(n)).alias("vec_id"),
        F.transform(
            dims,
            lambda j: comp(F.col("id"), j)
            + F.when(j == 0, F.lit(0.05)).otherwise(F.lit(0.0)).cast("float"),
        ).alias("embedding"),
    )
    base.unionByName(twins).repartition(32).write.parquet(path)
    return path


def _report(family, n, planted, wall, candidates, recovered, total_found, out):
    row = {
        "family": family,
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


def main() -> None:
    families = set(sys.argv[1:]) or {"minhash", "simhash", "embedding", "prefix"}
    spark = get_spark("bench-dedup-curve")
    out = []
    for n in DOC_SIZES:
        if not families & {"minhash", "simhash", "prefix"}:
            break
        docs = spark.read.parquet(make_docs(spark, n))
        planted = n // TWIN_EVERY

        if "prefix" in families:
            # EXACT All-Pairs prefix filter (r9 family — added when the
            # sf1 Heaps-vocabulary soak exposed the 4-5x lineage
            # recompute this operator used to pay): twins share 37/41
            # 3-gram shingles (J = 37/45 ~ 0.822 >= 0.8), so expect
            # recall 1.0 with candidates ~ planted twins, never n^2.
            from car_etl_spark.functions import text as TXT
            from car_etl_spark.operators.similarity import (
                prefix_candidate_pairs,
                prefix_filtered_jaccard_pairs,
                prefix_frames,
            )

            toked = docs.select(
                "doc_id", TXT.tokenize(F.lower(F.col("text"))).alias("__toks")
            )
            sets = toked.select(
                "doc_id", TXT.shingles_from_tokens(F.col("__toks"), 3).alias("s")
            ).filter(F.size("s") > 0)
            _sized, pref = prefix_frames(sets, "doc_id", "s", 4, 5)
            candidates = prefix_candidate_pairs(pref, "doc_id", 4, 5).count()
            wall = timed(
                lambda: prefix_filtered_jaccard_pairs(sets, "doc_id", "s", 4, 5).count()
            )
            # ONE construction for the result metrics (each call of the
            # operator eagerly re-materializes its checkpoints)
            found = [
                tuple(r)
                for r in prefix_filtered_jaccard_pairs(
                    sets, "doc_id", "s", 4, 5
                ).collect()
            ]
            recovered = sum(1 for a, b, _j in found if b - a == n)
            _report("prefix", n, planted, wall, candidates, recovered, len(found), out)

        if "minhash" in families:
            sigs = minhash_from_exploded(exploded_shingle_rows(docs))
            candidates = lsh_candidate_pairs(sigs).count()
            wall = timed(lambda: minhash_near_duplicates(docs).count())
            found = minhash_near_duplicates(docs)
            recovered = found.filter(F.col("id_b") - F.col("id_a") == n).count()
            _report("minhash", n, planted, wall, candidates, recovered, found.count(), out)

        if "simhash" in families:
            segments, subset = simhash_blocking_plan(n + planted, MAX_HAMMING)
            fp = simhash_fingerprints(docs, "text", "doc_id")
            candidates = simhash_blocked_candidates(fp, "doc_id", segments, subset).count()
            wall = timed(
                lambda: simhash_near_duplicates(
                    docs, max_hamming=MAX_HAMMING, expected_docs=n + planted
                ).count()
            )
            found = simhash_near_duplicates(
                docs, max_hamming=MAX_HAMMING, expected_docs=n + planted
            )
            recovered = found.filter(F.col("id_b") - F.col("id_a") == n).count()
            _report("simhash", n, planted, wall, candidates, recovered, found.count(), out)

    if "embedding" in families:
        for n in VEC_SIZES:
            emb = spark.read.parquet(make_vectors(spark, n))
            planted = n // TWIN_EVERY
            bands, bits, _recall = embedding_lsh_plan(n + planted, threshold=0.9)

            def dedup():
                return embedding_near_duplicates(
                    emb, threshold=0.9, dim=VEC_DIM, bands=bands, bits_per_band=bits
                )

            # candidate volume = the band join's output before verify
            from car_etl_spark.operators.similarity import embedding_lsh_bands

            banded = embedding_lsh_bands(emb, "embedding", VEC_DIM, bands, bits, 42, "vec_id")
            a = banded.select(F.col("vec_id").alias("id_a"), "band", "bucket")
            b = banded.select(F.col("vec_id").alias("id_b"), "band", "bucket")
            candidates = (
                a.join(b, ["band", "bucket"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
                .count()
            )
            wall = timed(lambda: dedup().count())
            recovered = dedup().filter(F.col("id_b") - F.col("id_a") == n).count()
            _report("embedding", n, planted, wall, candidates, recovered, dedup().count(), out)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
