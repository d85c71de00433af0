#!/usr/bin/env python
"""Dump the plan-diff evidence for the r12 continuation session:

- minhash_verify_stage_{before,after}.txt: the exact-Jaccard verify
  stage of minhash_near_duplicates.  Before = the ebd03ce shape
  (reconstructed verbatim: un-broadcast semi-join, shingled frame NOT
  checkpointed -> the scan+semi-join+shingle subtree appears TWICE in
  the plan, once per pair side).  After = the shipped shape (one
  checkpointed shingled frame read by both sides; broadcast-gated
  semi-join), plus the semi-join stage plan pre-checkpoint so the
  BroadcastHashJoin LeftSemi is visible (the final plan hides it
  behind the checkpoint's ExistingRDD).
- incremental_dedup_batch_{before,after}.txt: dedup_batch's pair plan,
  before reconstructed from the same commit (sa/sb both reading the
  full union; un-hinted band join).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from car_etl_spark.operators import similarity as S  # noqa: E402
from car_etl_spark.session import get_spark  # noqa: E402
from car_etl_spark.streaming import incremental_dedup as I  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r12")


def write_plan(df, name: str, header: str = "") -> None:
    path = os.path.join(OUT, f"{name}.txt")
    with open(path, "w") as f:
        if header:
            f.write(header.rstrip() + "\n\n")
        f.write(df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        ))
    print(f"wrote {path}")


def main() -> None:
    spark = get_spark("car-etl-spark-plan-dump")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # --- minhash verify stage ------------------------------------------
    sigs = S.minhash_from_exploded(
        S.exploded_shingle_rows(docs, "text", 3, "doc_id"), S.DEFAULT_NUM_HASHES, "doc_id"
    )
    candidates = S.lsh_candidate_pairs(sigs, "doc_id", S.DEFAULT_BANDS,
                                       S.DEFAULT_NUM_HASHES).localCheckpoint(eager=True)

    # before: ebd03ce's verify, verbatim
    cand_ids_old = (
        candidates.select(F.col("id_a").alias("doc_id"))
        .unionByName(candidates.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    shingled_old = S.with_shingles(docs.join(cand_ids_old, "doc_id", "left_semi"),
                                   "text", 3, "doc_id")
    sh_a = shingled_old.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = shingled_old.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    verify_old = (
        candidates.join(sh_a, "id_a").join(sh_b, "id_b")
        .select("id_a", "id_b",
                F.round(S.exact_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )
    write_plan(verify_old, "minhash_verify_stage_before",
               "# ebd03ce verify: the scan->semi-join(SMJ)->shingle subtree is built\n"
               "# TWICE (two disjoint parquet scans of the corpus, one per pair side)")

    # after: shipped shape — semi-join stage first (pre-checkpoint), then final
    cand_ids_new = S.candidate_id_frame(candidates, "doc_id", candidates.count())
    shingled_new_stage = S.with_shingles(docs.join(cand_ids_new, "doc_id", "left_semi"),
                                         "text", 3, "doc_id")
    shingled_ck = shingled_new_stage.localCheckpoint(eager=True)
    sh_a2 = shingled_ck.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b2 = shingled_ck.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    verify_new = (
        candidates.join(sh_a2, "id_a").join(sh_b2, "id_b")
        .select("id_a", "id_b",
                F.round(S.exact_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )
    hdr = ("# shipped verify: ONE shingled frame, checkpointed, read by both pair\n"
           "# sides (the two joins scan the same ExistingRDD).  The semi-join stage\n"
           "# plan below it shows the broadcast-gated prune (no corpus shuffle).\n")
    path = os.path.join(OUT, "minhash_verify_stage_after.txt")
    with open(path, "w") as f:
        f.write(hdr + "\n== final verify plan ==\n")
        f.write(verify_new._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            verify_new._jdf.queryExecution(), "formatted"))
        f.write("\n\n== shingled stage (materialized once by the checkpoint) ==\n")
        f.write(shingled_new_stage._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            shingled_new_stage._jdf.queryExecution(), "formatted"))
    print(f"wrote {path}")

    # --- incremental dedup batch ----------------------------------------
    store = S.minhash_from_exploded(
        S.exploded_shingle_rows(docs.filter(F.col("doc_id") % 10 < 9), "text", 3, "doc_id"),
        S.DEFAULT_NUM_HASHES, "doc_id",
    ).localCheckpoint(eager=True)
    batch = docs.filter(F.col("doc_id") % 10 >= 9)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from profile_incremental_dedup import dedup_batch_r12prev  # noqa: E402

    write_plan(dedup_batch_r12prev(batch, store), "incremental_dedup_batch_before",
               "# ebd03ce dedup_batch: sa AND sb attach from the full union (two\n"
               "# full-store passes) + un-hinted band join (store side shuffles\n"
               "# its banded rows before AQE can flip the strategy)")
    write_plan(I.dedup_batch(batch, store)[0], "incremental_dedup_batch_after",
               "# shipped dedup_batch: sa reads only the batch signatures; band\n"
               "# join broadcast-hinted below the row gate (store side map-only)")


if __name__ == "__main__":
    main()
