"""Extraction-persistence pipeline operators.

The reference's write path (SURVEY.md §3.3): versioned extraction rows
(BEFORE-INSERT trigger ``030_extractions.sql:84-121``), tall key-value
field storage (``031_extraction_fields.sql``), human field overrides
(``src/services/field_override.py:54-150``).  Spark-first: triggers
become deterministic per-batch window computations; the EAV table pivots
wide with an explicit field vocabulary (never inferred — schema
inference over 100 TB of keys is a full extra pass).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_versions(
    new_batch: DataFrame,
    existing: DataFrame | None,
    doc_col: str = "document_id",
    order_col: str = "extracted_at",
) -> DataFrame:
    """A7: deterministic MAX(version)+1 per document for a whole batch.

    The reference serializes inserts through a trigger; a distributed
    batch must version all rows of a document at once: base = existing
    max per doc (left join, 0 when new), offset = row_number within the
    batch ordered by ``order_col``.
    """
    if existing is not None and "version" in existing.columns:
        base = existing.groupBy(doc_col).agg(F.max("version").alias("base_version"))
    else:
        base = None
    w = Window.partitionBy(doc_col).orderBy(F.asc(order_col))
    out = new_batch.withColumn("batch_seq", F.row_number().over(w))
    if base is not None:
        out = out.join(F.broadcast(base), doc_col, "left").withColumn(
            "version",
            F.coalesce(F.col("base_version"), F.lit(0)) + F.col("batch_seq"),
        ).drop("base_version")
    else:
        out = out.withColumn("version", F.col("batch_seq"))
    return out.drop("batch_seq")


def mark_current(
    extractions: DataFrame, doc_col: str = "document_id", version_col: str = "version"
) -> DataFrame:
    """W3: ``is_current`` = latest version per document (the demote
    trigger as a window)."""
    w = Window.partitionBy(doc_col).orderBy(F.desc(version_col))
    return extractions.withColumn("is_current", F.row_number().over(w) == 1)


def apply_field_overrides(
    fields: DataFrame,
    overrides: DataFrame,
    keys: tuple[str, ...] = ("extraction_id", "field_name"),
) -> DataFrame:
    """X10: human-in-the-loop correction MERGE.

    Override rows win on (extraction_id, field_name); overridden rows
    keep provenance (``is_override`` true, original confidence dropped
    to the override's 1.0) — reference ``field_override.py:54-150``.
    """
    ov = overrides.select(
        *keys,
        F.col("field_value").alias("__ov_value"),
        F.col("overridden_by").alias("__ov_by"),
    )
    joined = fields.join(F.broadcast(ov), list(keys), "left")
    return (
        joined.withColumn("is_override", F.col("__ov_value").isNotNull())
        .withColumn(
            "field_value",
            F.coalesce(F.col("__ov_value"), F.col("field_value")),
        )
        .withColumn(
            "confidence",
            F.when(F.col("is_override"), F.lit(1.0)).otherwise(F.col("confidence")),
        )
        .withColumn("overridden_by", F.col("__ov_by"))
        .drop("__ov_value", "__ov_by")
    )


def pivot_eav(
    fields: DataFrame,
    vocabulary: Mapping[str, Callable[[Column], Column] | None] | list[str],
    id_col: str = "extraction_id",
    name_col: str = "field_name",
    value_col: str = "field_value",
) -> DataFrame:
    """Tall EAV -> wide, with an explicit vocabulary (S1/§1.1).

    ``vocabulary`` maps output column name -> a normalizer applied to the
    raw value (or a plain list for raw strings).  Implemented as
    conditional ``max(when(...))`` aggregation — a single shuffle on the
    id, no pivot-value inference scan, stable output schema.
    """
    if not isinstance(vocabulary, Mapping):
        vocabulary = {name: None for name in vocabulary}
    aggs = []
    for out_name, normalizer in vocabulary.items():
        raw = F.max(F.when(F.col(name_col) == out_name, F.col(value_col)))
        aggs.append(
            (normalizer(raw) if normalizer is not None else raw).alias(out_name)
        )
    return fields.groupBy(id_col).agg(*aggs)
