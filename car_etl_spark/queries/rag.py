"""RAG-dataflow queries: token-budget context fold and citation
validation (SURVEY.md §3.2, F16/F24/F25/U4) — oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from car_etl_spark.operators import rag as R
from car_etl_spark.queries import QuerySpec
from car_etl_spark.queries.textops import keyword_scores
from car_etl_spark.tables import load_tables


def rag_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F25: retrieve by keyword score, rank, greedily keep chunks while
    cumulative whitespace-token count stays within the 6000-token budget
    (reference ``context_builder.py:22-50``)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scored = keyword_scores(docs, ("spark", "data", "join"), "doc_id", "text").filter(
        F.col("score") > 0
    )
    # Bound the match set BEFORE any global window: score > 0 means the
    # doc contains at least one query term, so token_count >= 1 and the
    # running sum at rank r is >= r — no row past rank `budget` can ever
    # survive token_budget_fold's filter.  limit(budget) here is
    # therefore lossless, compiles to TakeOrderedAndProject (per-
    # partition top-k + driver merge, no full-set shuffle to one
    # partition), and both downstream global windows operate on a
    # <= budget-row slice.
    bounded = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(R.CONTEXT_TOKEN_BUDGET)
    from car_etl_spark.functions import text as T

    with_tokens = bounded.select(
        "doc_id", "score", T.token_count(F.col("text")).cast("long").alias("token_count")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = with_tokens.withColumn("rank", F.row_number().over(w).cast("long"))
    kept = R.token_budget_fold(ranked, budget=R.CONTEXT_TOKEN_BUDGET)
    return kept.select(
        "rank", "doc_id", "score", "token_count", F.col("cum_tokens").cast("long").alias("cum_tokens")
    ).orderBy("rank")


RAG_CONTEXT_BUDGET_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(TRIM(LOWER(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks,
         len(list_filter(string_split_regex(TRIM(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS token_count
  FROM documents
), scored AS (
  SELECT doc_id, token_count,
         len(list_filter(toks, x -> x = 'spark'))
         + len(list_filter(toks, x -> x = 'data'))
         + len(list_filter(toks, x -> x = 'join')) AS score
  FROM tok
), ranked AS (
  -- mirror of the Spark side's lossless limit(6000): score > 0 implies
  -- token_count >= 1, so ranks past the budget never pass the fold
  SELECT doc_id, score, token_count,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM (SELECT * FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id ASC LIMIT 6000)
), folded AS (
  SELECT rank, doc_id, score, token_count,
         SUM(token_count) OVER (ORDER BY rank ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM ranked
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, score, CAST(token_count AS BIGINT) AS token_count,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM folded WHERE cum_tokens <= 6000
ORDER BY rank
"""


def rag_citation_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16/U4: synthesize answers carrying ``[DOC:id:PAGE:n]`` tags,
    regex-extract the tags, validate each against the retrieved
    (doc, page) set — one of the two tags per answer is deliberately
    outside the retrieved set (reference ``citations.py:31-61``)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    answers = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("answer_id"),
        F.concat(
            F.lit("Rent is stated in [DOC:"),
            F.col("doc_id").cast("string"),
            F.lit(":PAGE:1] and disputed by [DOC:"),
            (F.col("doc_id") + 100000).cast("string"),
            F.lit(":PAGE:2]."),
        ).alias("answer"),
    )
    retrieved = docs.select("doc_id", F.lit(1).cast("long").alias("page"))
    cits = R.extract_citations(answers)
    validated = R.validate_citations(cits, retrieved)
    return (
        validated.groupBy("answer_id")
        .agg(
            F.count(F.lit(1)).alias("citation_count"),
            F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).cast("long").alias("valid_count"),
            (F.sum(F.when(F.col("is_valid"), 0).otherwise(1)) == 0).alias("fully_cited"),
        )
        .orderBy("answer_id")
    )


RAG_CITATION_SQL = """
WITH answers AS (
  SELECT doc_id AS answer_id,
         'Rent is stated in [DOC:' || CAST(doc_id AS VARCHAR) ||
         ':PAGE:1] and disputed by [DOC:' || CAST(doc_id + 100000 AS VARCHAR) ||
         ':PAGE:2].' AS answer
  FROM documents WHERE doc_id % 7 = 0
), tags AS (
  SELECT answer_id, unnest(regexp_extract_all(answer, '\\[DOC:(\\d+):PAGE:(\\d+)\\]')) AS citation
  FROM answers
), parsed AS (
  SELECT answer_id,
         CAST(regexp_extract(citation, '\\[DOC:(\\d+):PAGE:(\\d+)\\]', 1) AS BIGINT) AS cited_doc,
         CAST(regexp_extract(citation, '\\[DOC:(\\d+):PAGE:(\\d+)\\]', 2) AS BIGINT) AS cited_page
  FROM tags
), retrieved AS (
  SELECT doc_id, CAST(1 AS BIGINT) AS page FROM documents
)
SELECT answer_id,
       COUNT(*) AS citation_count,
       CAST(SUM(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS valid_count,
       SUM(CASE WHEN r.doc_id IS NOT NULL THEN 0 ELSE 1 END) = 0 AS fully_cited
FROM parsed p
LEFT JOIN retrieved r ON p.cited_doc = r.doc_id AND p.cited_page = r.page
GROUP BY answer_id
ORDER BY answer_id
"""


#: merge budget for the registry's learned-BPE arm — sized to the
#: synthetic corpus (31-word vocabulary converges to whole-word tokens
#: at ~105 merges; 48 leaves ~2/3 of the vocabulary genuinely
#: multi-token) so the hash actually discriminates learned-subword
#: counts from whitespace counts, the same sizing discipline as the
#: chunker's 16-token windows.  Real deployments pass their own budget
#: (tiktoken-class vocabularies are 32k-100k merges).
RAG_BPE_MERGES = 48


def rag_context_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24/F25 suite: the greedy 6000-token context fold under BOTH
    token-counting backends, mode-tagged in one slot —

    - ``regex_ws``: whitespace token counts (the SQL-pure twin;
      `rag_context_budget`'s sub-expression unchanged);
    - ``learned_bpe``: corpus-trained BPE counts (Sennrich merges from
      the persisted content-addressed store,
      ``operators/bpe_store.py``), applied per distinct word inside the
      Arrow-batched counting pandas_udf.

    This is the production consumer of the trained tokenizer the
    reference's context builder implies (tiktoken,
    ``src/rag/context_builder.py:7-19``): the budget fold runs on real
    learned-subword counts, not the regex approximation.  The oracle
    verifies the learned arm through the store's vocabulary twin
    (word -> n_tokens join + sum), so the distributed counting pipeline
    is value-hash-checked end to end.

    SERVING SHAPE (r7): the retrieval leg reads the bucket-pruned
    POSTING STORE (the reference retriever reads its GIN index,
    ``042_match_function.sql:35-46``) — raw_term tf sums are value-
    identical to the raw-text regexp score (pinned by
    ``doc_keyword_search``'s oracle row, and by this row's raw-scan
    oracle twin).  The match set is bounded by a LOSSLESS
    ``limit(budget)`` before any global window: score > 0 implies
    token_count >= 1 under BOTH counting backends, so cum_tokens at
    rank r is >= r and ranks past the budget never survive the fold.
    Only the <= budget winners ever touch the raw text (join for the
    token-count columns), rank is computed ONCE (it depends only on
    (score, doc_id), identical across arms), and the two arms unpivot
    from one slice with a mode-partitioned fold — one corpus-free
    serving pass instead of two corpus scans."""
    from car_etl_spark.functions import text as T
    from car_etl_spark.functions.bpe import bpe_token_counts
    from car_etl_spark.functions.text import stem_py
    from car_etl_spark.operators.bpe_store import ensure_bpe_merges
    from car_etl_spark.operators.indexing import ensure_posting_index
    from car_etl_spark.queries import prepared

    terms = ("spark", "data", "join")

    def build() -> DataFrame:
        store = ensure_posting_index(spark, sf_dir)
        buckets = sorted({store.bucket_of(stem_py(t)) for t in terms})
        top = (
            store.read(spark, buckets=buckets)
            .filter(F.col("raw_term").isin(list(terms)))
            .groupBy("doc_id")
            .agg(F.sum("tf").cast("long").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(R.CONTEXT_TOKEN_BUDGET)
        )
        docs = load_tables(spark, sf_dir, ("documents",))["documents"]
        # text fetch for the winners only — broadcast the <= budget-row
        # top side (never the corpus): map-only probe over documents
        bounded = docs.select("doc_id", "text").join(F.broadcast(top), "doc_id")
        merges = ensure_bpe_merges(spark, sf_dir, num_merges=RAG_BPE_MERGES)
        both = bpe_token_counts(bounded, merges, "text", "bpe_tokens").withColumn(
            "ws_tokens", T.token_count(F.col("text")).cast("long")
        ).drop("text")
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ranked = both.withColumn("rank", F.row_number().over(w).cast("long"))
        stacked = ranked.select(
            "rank",
            "doc_id",
            "score",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("regex_ws").alias("mode"),
                        F.col("ws_tokens").cast("long").alias("token_count"),
                    ),
                    F.struct(
                        F.lit("learned_bpe").alias("mode"),
                        F.col("bpe_tokens").cast("long").alias("token_count"),
                    ),
                )
            ).alias("mt"),
        ).select("mt.mode", "rank", "doc_id", "score", "mt.token_count")
        kept = R.token_budget_fold(
            stacked, budget=R.CONTEXT_TOKEN_BUDGET, partition_by=("mode",)
        )
        return kept.select(
            "mode",
            "rank",
            "doc_id",
            "score",
            F.col("token_count").cast("long").alias("token_count"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        ).orderBy("mode", "rank")

    return prepared(
        spark, "rag_context_modes", sf_dir, ("documents.parquet",), build
    )


def _rag_context_modes_sql(sf_dir: str) -> str:
    """Oracle builder (sf-aware): materializes the BPE store's
    vocabulary twin for this corpus, then verifies the learned arm as
    explode-words -> join(word, n_tokens) -> sum -> fold in DuckDB."""
    from car_etl_spark.operators.bpe_store import (
        ensure_bpe_oracle_artifacts,
        vocab_counts_path,
    )

    vocab = vocab_counts_path(ensure_bpe_oracle_artifacts(sf_dir, num_merges=RAG_BPE_MERGES))
    bpe_sql = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(TRIM(LOWER(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, toks,
         len(list_filter(toks, x -> x = 'spark'))
         + len(list_filter(toks, x -> x = 'data'))
         + len(list_filter(toks, x -> x = 'join')) AS score
  FROM tok
), bpe AS (
  SELECT doc_id, CAST(SUM(v.n_tokens) AS BIGINT) AS token_count
  FROM (SELECT doc_id, unnest(toks) AS w FROM scored WHERE score > 0) words
  JOIN read_parquet('{vocab}') v ON words.w = v.word
  GROUP BY doc_id
), ranked AS (
  -- lossless limit(6000) mirror, as in RAG_CONTEXT_BUDGET_SQL
  SELECT doc_id, score, token_count,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM (SELECT s.doc_id, s.score, b.token_count
        FROM scored s JOIN bpe b ON s.doc_id = b.doc_id
        WHERE s.score > 0
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 6000)
), folded AS (
  SELECT rank, doc_id, score, token_count,
         SUM(token_count) OVER (ORDER BY rank ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM ranked
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, score,
       CAST(token_count AS BIGINT) AS token_count,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM folded WHERE cum_tokens <= 6000
"""
    return f"""
SELECT * FROM (
SELECT 'regex_ws' AS mode, rank, doc_id, score, token_count, cum_tokens
FROM ({RAG_CONTEXT_BUDGET_SQL})
UNION ALL
SELECT 'learned_bpe' AS mode, rank, doc_id, score, token_count, cum_tokens
FROM ({bpe_sql})
) ORDER BY mode, rank
"""


QUERIES: dict[str, QuerySpec] = {
    "rag_context_modes": QuerySpec(
        rag_context_modes, _rag_context_modes_sql, ("rag", "bpe", "suite")
    ),
    "rag_citation_validation": QuerySpec(rag_citation_validation, RAG_CITATION_SQL, ("rag",)),
}


def rag_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG-ingestion splitter (operators/chunking.py) over the
    corpus: 16-token windows with 4-token overlap (sized to the
    synthetic docs so overlap is actually exercised), with a sha256
    over content proving exact byte-level parity per chunk."""
    from pyspark.sql import functions as F

    from car_etl_spark.operators.chunking import chunk_by_tokens
    from car_etl_spark.tables import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    chunks = chunk_by_tokens(docs, max_tokens=16, overlap=4)
    return (
        chunks.select(
            "doc_id",
            "chunk_index",
            "token_count",
            F.sha2(F.col("content"), 256).alias("content_sha"),
        )
        # hash-materialize below the sort (§2 sampling tax: the range
        # sampler re-ran the chunk explode + sha256 over the corpus)
        .repartition("doc_id", "chunk_index")
        .orderBy("doc_id", "chunk_index")
    )


RAG_CHUNK_WINDOWS_SQL = """
WITH toked AS (
  SELECT doc_id,
         string_split_regex(TRIM(text), '[ \\t\\n\\x0B\\f\\r]+') AS toks
  FROM documents
  WHERE TRIM(text) <> ''
), exploded AS (
  SELECT doc_id, len(toks) AS n, toks,
         unnest(range(0, greatest(len(toks) - 4, 1), 12)) AS start
  FROM toked
)
SELECT doc_id,
       CAST(start / 12 AS BIGINT) AS chunk_index,
       len(toks[start + 1 : start + 16]) AS token_count,
       sha256(array_to_string(toks[start + 1 : start + 16], ' ')) AS content_sha
FROM exploded
ORDER BY doc_id, chunk_index
"""

QUERIES["rag_chunk_windows"] = QuerySpec(
    rag_chunk_windows, RAG_CHUNK_WINDOWS_SQL, ("rag", "chunking")
)
