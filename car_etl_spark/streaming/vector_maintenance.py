"""Incremental IVF-layout maintenance as a streaming job.

The reference's HNSW index absorbs vector writes row-by-row
(``041_vector_index.sql:6-8`` — Postgres updates the index on INSERT/
UPDATE/DELETE).  The Spark-native equivalent is a ``foreachBatch`` over
a vector-change stream applying each micro-batch to the persisted
:class:`~car_etl_spark.operators.indexing.IvfStore`: upserted vectors
are assigned to the frozen coarse quantizer and appended batch-tagged,
deletes append tombstones, and the store's merged read path (and the
exact-probe certificate, via per-batch radius widening + pessimistic
tombstone debt) serves maintenance immediately — no rebuild between
compactions.

Batch semantics mirror :mod:`posting_maintenance`: only the latest
change per vec_id applies within a micro-batch (delete-wins on exact
sequence ties), replays are sentinel-idempotent, so the store is
exactly-once per batch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from car_etl_spark.operators.indexing import IvfStore
from car_etl_spark.session import tune_session

#: landing-file schema for vector changes (embedding-service drops)
VEC_CHANGES_SCHEMA = (
    "vec_id long, embedding array<float>, label int, op string, change_seq long"
)


def vec_changes_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    tune_session(spark)
    return (
        spark.readStream.schema(VEC_CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def latest_change_per_vec(batch_df: DataFrame) -> DataFrame:
    """One row per vec_id — newest change_seq wins, delete preferred on
    exact ties (the CDC delete-wins convention)."""
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("change_seq"), F.desc(F.col("op") == "delete")
    )
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def vector_maintenance_handler(store: IvfStore):
    """foreachBatch handler: apply one micro-batch of vector changes.
    Batch ids shift +1 (the store reserves batch 0 for the base)."""

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        latest = latest_change_per_vec(batch_df)
        upserts = latest.filter(F.col("op") == "upsert").select(
            "vec_id", "embedding", "label"
        )
        deleted = [
            r.vec_id
            for r in latest.filter(F.col("op") == "delete").select("vec_id").collect()
        ]
        store.apply_batch(
            batch_df.sparkSession, upserts, deleted, int(batch_id) + 1
        )

    return handler


def run_vector_maintenance(
    spark: SparkSession,
    landing_dir: str,
    store: IvfStore,
    checkpoint_dir: str,
) -> None:
    """Drain the landing dir into the store (availableNow in tests,
    processingTime trigger in production)."""
    stream = vec_changes_stream(spark, landing_dir)
    q = (
        stream.writeStream.foreachBatch(vector_maintenance_handler(store))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
