"""Streaming jobs over the ``events`` table.

Re-expresses the reference's hand-rolled streaming concepts
(SURVEY.md §2.9) as Structured Streaming:

- T1 micro-batch trigger: the worker's 5 s poll loop
  (reference ``src/workers/extraction_worker.py:122-142``) becomes
  ``trigger(availableNow=True)`` in tests / ``processingTime`` in prod.
- T2 checkpointing: connector delta tokens
  (``src/connectors/google_drive/sync.py:301-335``) become
  ``checkpointLocation`` offset logs.
- T3 idempotency: the completed/lock-window check
  (``src/extraction/idempotency.py:258-322``) becomes
  ``withWatermark + dropDuplicates`` state-store dedup.
- T5 retry/DLQ: attempts < 3 else dead-letter
  (``extraction_worker.py:36-37,416-443``) runs in ``foreachBatch``.
- T7 event-time windows with late-data tolerance: new capability beyond
  the reference (it only stores received_at vs created_at).

Batch/stream parity: the aggregations here are the same expressions as
``queries/eventsq.py``; tests assert availableNow output equals the
batch result, which is the strongest correctness statement Structured
Streaming admits.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from car_etl_spark.session import tune_session

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false); cast to
        # session-TZ TIMESTAMP (UTC, value-preserving) in events_stream
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

MAX_ATTEMPTS = 3  # reference src/workers/extraction_worker.py:36


def events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-based streaming source over a landing DIRECTORY of event
    parquet files (T1/T2) — new files appearing in the directory are the
    micro-batches, mirroring connector delta-sync drops.

    ``maxFilesPerTrigger`` caps micro-batch size like the worker's
    batch <= concurrency rule; the ``ts`` physical type is PROBED from
    the directory with a batch read (streams require a declared schema,
    but the testdata generation has shipped both TIMESTAMP(NANOS) —
    surfacing as bigint under nanosAsLong — and no-tz MICROS across
    rounds), then normalized to TIMESTAMP exactly as the batch path
    (load_tables) does — value preserving under the pinned UTC session
    timezone.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    tune_session(spark)
    probed = {f.name: f.dataType for f in spark.read.parquet(events_dir).schema.fields}
    nanos_as_long = isinstance(probed.get("ts"), LongType)
    schema = StructType(
        [
            StructField("ts", LongType()) if f.name == "ts" and nanos_as_long else f
            for f in EVENTS_SCHEMA.fields
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    if nanos_as_long:
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_windowed_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """T7: watermarked tumbling event-time window x type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


def sliding_window_value(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """T7: sliding window (1 h window, 30 min slide) per-type value sums."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "total_value",
        )
    )


def dedup_within_watermark(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T3: exactly-once-style idempotency — drop replayed event_ids
    within the watermark horizon (state-store dedup)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


class QueueWorker:
    """TEST SCAFFOLDING for the T5 retry/DLQ state transition.

    The canonical implementation is :func:`stateful_attempt_tracker`
    (applyInPandasWithState): state lives in the checkpointed state
    store, distributed per key — this class keeps the same transition in
    a driver dict purely so unit tests can assert it without a state
    store, and must NOT be used where key cardinality is unbounded (the
    aggregated collect() is a driver-memory ceiling).
    """

    def __init__(self) -> None:
        self.attempts: dict[int, int] = {}
        self.completed = 0
        self.dead_lettered: set[int] = set()

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.groupBy("user_id")
            .agg(
                F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
                F.sum(F.when(F.col("event_type") != "error", 1).otherwise(0)).alias("oks"),
            )
            .collect()
        )
        for r in rows:
            self.completed += r["oks"]
            prior = self.attempts.get(r["user_id"], 0)
            new = prior + r["errors"]
            self.attempts[r["user_id"]] = new
            if new > MAX_ATTEMPTS:
                self.dead_lettered.add(r["user_id"])


ATTEMPT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("attempts", LongType()),
        StructField("batch_events", LongType()),
        StructField("status", StringType()),
    ]
)
ATTEMPT_STATE_SCHEMA = StructType([StructField("attempts", LongType())])

STALE_TIMEOUT_MS = 3_600_000  # reference extraction_worker.py:38 (1 h)


def stateful_attempt_tracker(stream: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """T4/T5: per-key attempt state in the state store.

    The reference's stale-lock cleanup (processing > 1 h -> failed,
    ``idempotency.py:325-383``) maps to ``applyInPandasWithState``:
    error events accumulate attempts across micro-batches AND across
    restarts (checkpointed state store); keys exceeding MAX_ATTEMPTS
    emit ``dead_letter``.  With ``timeout="ProcessingTimeTimeout"`` a key
    silent past STALE_TIMEOUT_MS emits ``stale_reset`` and its state is
    dropped — use that mode only with continuous triggers
    (``availableNow`` would keep re-arming timers and never drain).
    """

    def track(key, pdfs, state):
        user_id = key[0]
        if state.hasTimedOut:
            (attempts,) = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "attempts": attempts, "batch_events": 0,
                  "status": "stale_reset"}]
            )
            return
        total = 0
        errors = 0
        for pdf in pdfs:
            total += len(pdf)
            errors += int((pdf["event_type"] == "error").sum())
        prior = state.get[0] if state.exists else 0
        attempts = prior + errors
        state.update((attempts,))
        if timeout == "ProcessingTimeTimeout":
            state.setTimeoutDuration(STALE_TIMEOUT_MS)
        status = "dead_letter" if attempts > MAX_ATTEMPTS else "processing"
        yield pd.DataFrame(
            [{"user_id": user_id, "attempts": attempts, "batch_events": total,
              "status": status}]
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        track,
        ATTEMPT_OUTPUT_SCHEMA,
        ATTEMPT_STATE_SCHEMA,
        "update",
        timeout,
    )


def run_available_now(
    df: DataFrame, checkpoint_dir: str, sink_table: str, output_mode: str = "append"
) -> None:
    """Drain all available input as micro-batches into a memory sink
    (the availableNow analog of the worker's poll-until-empty loop)."""
    q = (
        df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch(
    df: DataFrame, checkpoint_dir: str, handler, output_mode: str = "update"
) -> None:
    q = (
        df.writeStream.foreachBatch(handler)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
