"""Token-window document chunking (the RAG-ingestion splitter).

The reference persists ready-made chunks into ``document_chunks``
(``040_document_chunks.sql:12-26``: content, token_count, chunk_index)
via the redact-before-write sink (``src/search/chunk_storage.py:35-112``);
the splitter that produces them runs upstream of that sink.  This is
the Spark-native splitter: fixed token windows with overlap, pure
Column expressions end to end.

Shape at scale: tokenize once (map-side), one ``explode`` of the
per-document start offsets — output rows ~ tokens/stride per doc, no
shuffle at all until the caller aggregates or writes.  Chunks inherit
``doc_id`` so a partitioned write by doc hash co-locates a document's
chunks for the later enrichment join (J2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_by_tokens(
    docs: DataFrame,
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 16,
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Split each document into ``max_tokens``-token windows advancing
    by ``max_tokens - overlap`` (so consecutive chunks share ``overlap``
    tokens — the standard RAG retrieval-context trick).  Empty/blank
    documents yield no chunks; the final window may be shorter.

    Output: ``keep`` columns + (chunk_index, token_count, content).
    """
    if not (0 <= overlap < max_tokens):
        raise ValueError("require 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " ")
    staged = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(*keep, toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
    )
    # last admissible start must ADD tokens beyond the overlap it
    # shares with the previous chunk (start + overlap < n) — a window
    # starting later is fully contained in its predecessor and would
    # store a 100%-duplicate chunk
    last_start = F.greatest(F.col("__n") - 1 - overlap, F.lit(0))
    exploded = staged.select(
        *keep,
        "__toks",
        F.explode(
            F.sequence(F.lit(0), last_start, F.lit(stride))
        ).alias("__start"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start") + 1, max_tokens)
    return exploded.select(
        *keep,
        (F.col("__start") / stride).cast("long").alias("chunk_index"),
        F.size(piece).alias("token_count"),
        F.array_join(piece, " ").alias("content"),
    )
