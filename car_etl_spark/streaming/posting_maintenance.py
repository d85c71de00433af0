"""Incremental posting-table maintenance as a streaming job (T8 + F20).

The reference keeps its keyword index fresh with a row trigger
(``supabase/migrations/044_keyword_search.sql:37-43``: every document
write recomputes that row's tsvector into the GIN index).  The Spark
equivalent is a ``foreachBatch`` over the document-change stream that
applies each micro-batch to the persisted
:class:`~car_etl_spark.operators.indexing.PostingStore`: new/changed
docs get their postings re-derived and appended (batch-tagged), deleted
docs get tombstones, and the store's read path serves the merged view —
queries never see a half-applied document.

Semantics per micro-batch (mirroring the CDC current-view logic in
``streaming/cdc.py``): only the LATEST change per doc_id (by
``change_seq``) applies — an upsert-then-delete within one batch
deletes, a delete-then-upsert re-adds.  Structured Streaming may replay
a batch after a crash; ``apply_batch``'s sentinel makes replays no-ops,
so the store is exactly-once per batch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from car_etl_spark.operators.indexing import PostingStore
from car_etl_spark.session import tune_session

#: landing-file schema for document changes (connector drops)
DOC_CHANGES_SCHEMA = (
    "doc_id long, lang string, text string, op string, change_seq long"
)


def doc_changes_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-based stream of document-change drops: each parquet file in
    the landing dir is a connector sync batch."""
    tune_session(spark)
    return (
        spark.readStream.schema(DOC_CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def latest_change_per_doc(batch_df: DataFrame) -> DataFrame:
    """Collapse a micro-batch to one row per doc — the newest change
    wins (change_seq, then op with delete preferred on exact ties, the
    CDC delete-wins convention)."""
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("change_seq"), F.desc(F.col("op") == "delete")
    )
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def posting_maintenance_handler(store: PostingStore):
    """The foreachBatch handler: apply one micro-batch of doc changes to
    the posting store.  Batch ids are shifted +1 because the store
    reserves batch 0 for the base build."""

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        latest = latest_change_per_doc(batch_df)
        upserts = latest.filter(F.col("op") == "upsert").select(
            "doc_id", "lang", "text"
        )
        # deleted ids are control-plane small per micro-batch (a
        # connector page of changes), like the CDC tombstone sets
        deleted = [
            r.doc_id
            for r in latest.filter(F.col("op") == "delete").select("doc_id").collect()
        ]
        store.apply_batch(
            batch_df.sparkSession, upserts, deleted, int(batch_id) + 1
        )

    return handler


def run_posting_maintenance(
    spark: SparkSession,
    landing_dir: str,
    store: PostingStore,
    checkpoint_dir: str,
) -> None:
    """Drain the landing dir into the store (availableNow in tests,
    processingTime trigger in production)."""
    stream = doc_changes_stream(spark, landing_dir)
    q = (
        stream.writeStream.foreachBatch(posting_maintenance_handler(store))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
