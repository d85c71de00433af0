"""RAG pipeline dataflow (SURVEY.md §3.2) — everything except the LLM
call is DataFrame ops; generation is a deterministic stub behind the
same interface a real model UDF would use.

Stages (reference ``src/rag/pipeline.py:49-116``):
retrieve (scored scan) -> rank -> token-budget context fold
(``context_builder.py:22-50``: greedy stop at 6000 tokens) -> generate
(stub) -> citation extract/validate
(``citations.py:8,31-61``: ``[DOC:id:PAGE:n]`` tags must refer to
retrieved (doc,page) pairs, else the answer is rejected).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from car_etl_spark.functions import text as T

CONTEXT_TOKEN_BUDGET = 6000  # reference src/rag/context_builder.py:22
CITATION_PATTERN = r"\[DOC:(\d+):PAGE:(\d+)\]"  # reference src/rag/citations.py:8


def token_budget_fold(
    ranked: DataFrame,
    budget: int = CONTEXT_TOKEN_BUDGET,
    rank_col: str = "rank",
    tokens_col: str = "token_count",
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """F25: greedy budget fold as a running-sum window filter.

    Keep a chunk iff the cumulative token count *through it* (in rank
    order) stays within budget — exactly the reference's greedy loop,
    but distributed (per query-partition in the multi-query case).

    BOUNDED-INPUT CONTRACT: the single-query form runs the cumulative
    sum through a GLOBAL window (no partitionBy — everything moves to
    one partition), so ``ranked`` must already be a bounded slice.
    When every row has ``token_count >= 1`` (true whenever rows were
    selected by a match score > 0), ``.orderBy(rank).limit(budget)``
    upstream is lossless: cum_tokens at rank r is >= r, so no row past
    rank ``budget`` can pass the filter.  Callers rank AFTER such a
    limit (see ``queries/rag.py``), which compiles to
    TakeOrderedAndProject and keeps both global windows on a
    <= budget-row slice.  Multi-query callers pass ``partition_by``
    (query id / mode) so the running sum hash-partitions by group
    instead of going global.
    """
    base = Window.partitionBy(*partition_by) if partition_by else Window
    w = base.orderBy(F.asc(rank_col)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ranked.withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .filter(F.col("cum_tokens") <= budget)
    )


def generate_stub(context: DataFrame, id_col: str = "doc_id", page_col: str = "page") -> DataFrame:
    """X8 stub: deterministic 'answer' that cites every context doc —
    the shape a temperature-0 generator is prompted to produce."""
    cite = F.concat(
        F.lit("[DOC:"), F.col(id_col).cast("string"),
        F.lit(":PAGE:"), F.col(page_col).cast("string"), F.lit("]"),
    )
    return context.groupBy().agg(
        F.concat(
            F.lit("Based on the retrieved context "),
            F.array_join(F.array_sort(F.collect_list(cite)), " "),
            F.lit(" the answer follows."),
        ).alias("answer")
    )


def extract_citations(answers: DataFrame, answer_col: str = "answer") -> DataFrame:
    """F16: regex-extract all citation tags, exploded to rows."""
    tags = F.regexp_extract_all(F.col(answer_col), F.lit(CITATION_PATTERN), F.lit(0))
    out = answers.withColumn("citation", F.explode(tags))
    return out.withColumn(
        "cited_doc", F.regexp_extract("citation", CITATION_PATTERN, 1).cast("long")
    ).withColumn(
        "cited_page", F.regexp_extract("citation", CITATION_PATTERN, 2).cast("long")
    )


def validate_citations(
    citations: DataFrame,
    retrieved: DataFrame,
    doc_col: str = "cited_doc",
    page_col: str = "cited_page",
) -> DataFrame:
    """Citations must match retrieved (doc, page) pairs (left join +
    validity flag); invalid citations fail the answer (reference
    ``citations.py:31-61`` -> no-info fallback)."""
    pairs = retrieved.select(
        F.col("doc_id").alias(doc_col), F.col("page").alias(page_col)
    ).distinct().withColumn("__valid", F.lit(True))
    return (
        citations.join(F.broadcast(pairs), [doc_col, page_col], "left")
        .withColumn("is_valid", F.coalesce(F.col("__valid"), F.lit(False)))
        .drop("__valid")
    )
