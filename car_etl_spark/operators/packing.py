"""Sequence packing for training export: fold token-counted items
(document chunks) into fixed-token-budget training rows.

The terminal transform between the curated corpus (``queries/mix.py``,
``queries/dedup.py``) and the shard writer (``operators/export.py``):
LLM pretraining consumes fixed-length sequences, so the exporter must
assign every chunk a (pack, offset) slot deterministically.  Two
standard disciplines, both implemented:

- **cut** (:func:`pack_cut`): concatenate each shard's token stream in
  deterministic order and cut at exact ``budget`` boundaries — items
  may SPAN packs (each crossing emits one segment per pack touched,
  with document-boundary metadata so the loader can mask attention
  across documents).  Zero padding waste; the GPT-style pack-and-cut.
  Pure Column algebra: one per-shard running sum + one bounded
  ``sequence`` explode — a single shuffle at any scale, no Python.
- **next-fit** (:func:`pack_nextfit`): whole items only — an item that
  would overflow the open pack closes it and starts the next.  No item
  ever splits (instruction-tuning shape), at the cost of tail padding.
  The fold is inherently sequential PER SHARD (each decision depends
  on the running fill with resets — not a prefix sum), so it runs as
  one Arrow-batched ``applyInPandas`` pass per shard: shards are the
  parallel unit, exactly like the shard writer itself.

Determinism contract (shared with ``operators/export.py``): shard
membership and intra-shard order are pure functions of the row key
(the portable md5 hash), so pack assignment is identical across runs,
partitionings, and engines — the DuckDB twin replays ``cut`` with the
same running sum and ``next-fit`` with a recursive CTE, exact to the
hash (the ``training_pack`` registry row).

Both folds assume items are budget-bounded (chunking upstream enforces
``max_tokens <= budget``); next-fit gives an oversized item a pack of
its own rather than looping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _off_col(shard_col: str, order_cols: tuple[str, ...], tokens_col: str):
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")


def pack_cut(
    items: DataFrame,
    budget: int,
    shard_col: str = "shard",
    order_cols: tuple[str, ...] = ("ord", "chunk_index"),
    tokens_col: str = "token_count",
    keep: tuple[str, ...] = ("doc_id", "chunk_index"),
) -> DataFrame:
    """Concat-and-cut packing: segment grain output.

    Every item occupies the half-open token interval
    ``[off, off + tc)`` of its shard's stream (``off`` = exclusive
    running sum in deterministic order); pack ``p`` owns
    ``[p*budget, (p+1)*budget)``.  One output row per (item, pack)
    overlap: ``pack_id, pos_in_pack, seg_tokens`` plus
    ``starts_item/ends_item`` boundary flags (1/0) — enough for a
    loader to reassemble documents and mask attention at boundaries.

    Plan shape: ONE hash exchange on the shard column serves both the
    running-sum window and any downstream per-shard write; the span
    explode is map-side and bounded by ``ceil(tc/budget)+1`` rows per
    item.  No driver state, no Python.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    off = _off_col(shard_col, order_cols, tokens_col)
    staged = items.withColumn("__off", off).filter(F.col(tokens_col) > 0)
    first_p = F.floor(F.col("__off") / budget).cast("long")
    last_p = F.floor((F.col("__off") + F.col(tokens_col) - 1) / budget).cast("long")
    spanned = staged.withColumn(
        "pack_id", F.explode(F.sequence(first_p, last_p))
    )
    seg_start = F.greatest(F.col("__off"), F.col("pack_id") * budget)
    seg_end = F.least(
        F.col("__off") + F.col(tokens_col), (F.col("pack_id") + 1) * budget
    )
    return spanned.select(
        shard_col,
        "pack_id",
        *keep,
        (seg_start - F.col("pack_id") * budget).cast("long").alias("pos_in_pack"),
        (seg_end - seg_start).cast("long").alias("seg_tokens"),
        (seg_start == F.col("__off")).cast("int").alias("starts_item"),
        (seg_end == F.col("__off") + F.col(tokens_col)).cast("int").alias(
            "ends_item"
        ),
    )


def pack_nextfit(
    items: DataFrame,
    budget: int,
    shard_col: str = "shard",
    order_cols: tuple[str, ...] = ("ord", "chunk_index"),
    tokens_col: str = "token_count",
) -> DataFrame:
    """Greedy next-fit packing: whole-item grain output.

    Adds ``pack_id`` and ``pos_in_pack`` (the pack's fill before this
    item) to the input columns.  The fold is sequential per shard —
    pack boundaries depend on the running fill WITH RESETS, which no
    prefix-sum window expresses — so it runs as one Arrow-batched
    pandas pass per shard group.  At 100 TB the shard count is the
    parallelism (same as the shard writer); a shard's item METADATA
    (key, token count — not content) is what must fit a task, the same
    bound the deterministic-order sort already needs.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    out_schema = StructType(
        list(items.schema.fields)
        + [
            StructField("pack_id", LongType()),
            StructField("pos_in_pack", LongType()),
        ]
    )
    in_cols = [f.name for f in items.schema.fields]
    ord_cols = list(order_cols)

    def fold(pdf):
        import numpy as np

        pdf = pdf.sort_values(ord_cols, kind="mergesort").reset_index(drop=True)
        tc = pdf[tokens_col].to_numpy()
        pack = np.zeros(len(tc), dtype="int64")
        pos = np.zeros(len(tc), dtype="int64")
        p = 0
        fill = 0
        for i in range(len(tc)):
            t = int(tc[i])
            if fill + t > budget and fill > 0:
                p += 1
                fill = 0
            pack[i] = p
            pos[i] = fill
            fill += t
        pdf = pdf[in_cols]
        pdf["pack_id"] = pack
        pdf["pos_in_pack"] = pos
        return pdf

    return items.groupBy(shard_col).applyInPandas(fold, out_schema)


def write_packed_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    order_cols: tuple[str, ...] = ("pack_id", "pos_in_pack"),
    mode: str = "overwrite",
) -> None:
    """Land packed rows under ``shard=<s>/`` directories in pack order
    — the export contract of ``write_training_shards`` (shard leads the
    sort: FileFormatWriter re-sorts by partition columns otherwise and
    would drop the intra-shard pack order)."""
    (
        df.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, *order_cols)
        .write.mode(mode)
        .partitionBy(shard_col)
        .parquet(path)
    )
