"""Full-text-search posting list + CDC tombstone queries.

F20/F21: the reference's tsvector/GIN machinery
(``044_keyword_search.sql:22-34``: weight A for headers, B for content;
``043_fulltext_search.sql``) becomes a materialized posting-list table —
tokenize -> posexplode -> (term, doc, tf, weight) — and ts_rank becomes
a weighted tf score over a term join.  At 100 TB the posting table is
written once, partitioned by term hash, and maintained incrementally by
the streaming layer; queries join a handful of terms against it.

T8: source-deletion tombstones (``043_document_source_deletions.sql``,
``sharepoint/sync.py:282-333``) — CDC apply = latest-state-per-key with
delete markers winning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from car_etl_spark.functions import text as T
from car_etl_spark.operators.indexing import (
    BODY_WEIGHT,
    HEADER_TOKENS,
    HEADER_WEIGHT,
    ensure_posting_index,
)
from car_etl_spark.queries import QuerySpec
from car_etl_spark.tables import load_tables


def build_postings(docs: DataFrame) -> DataFrame:
    """F20: the posting-list build — tokenize once, posexplode, STEM,
    weight by position class, aggregate term frequency per (doc, term,
    weight).  Stemming is the suffix-strip Column expression
    (:func:`car_etl_spark.functions.text.stem`) — the declared minimal
    stand-in for the reference's english tsvector stemming
    (``044_keyword_search.sql:22-34``)."""
    toked = docs.select("doc_id", T.tokenize(F.lower(F.col("text"))).alias("toks"))
    posted = toked.select(
        "doc_id", F.posexplode("toks").alias("pos", "raw_term")
    ).withColumn(
        "term", T.stem(F.col("raw_term"))
    ).withColumn(
        "weight",
        F.when(F.col("pos") < HEADER_TOKENS, F.lit(HEADER_WEIGHT)).otherwise(F.lit(BODY_WEIGHT)),
    )
    return posted.groupBy("doc_id", "term", "weight").agg(
        F.count(F.lit(1)).alias("tf")
    )


FTS_QUERY_TERMS = ("spark", "windows", "merges")


def fts_posting_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 SERVING PATH: weighted-tf relevance served from the
    PERSISTED posting table (:mod:`car_etl_spark.operators.indexing`) —
    the GIN-index-resident shape the reference's published latencies
    amortize (``044_keyword_search.sql:10-12``).  The query stems its
    terms driver-side, prunes the store to <= |terms| term-bucket
    partitions (PartitionFilters), pushes the term predicate into the
    parquet scan, and aggregates only the matching posting rows —
    corpus size never enters the per-call cost.

    Score parity with the scan twin (:func:`fts_posting_scan`, which
    re-derives the posting list from raw text per call): postings roll
    up tf per (doc, raw_term, weight), so SUM(tf * weight) here equals
    the twin's SUM(weight) over raw matched rows — weights are small
    integers in double, addition/multiplication exact, bit-identical
    (the oracle hash confirms)."""
    from car_etl_spark.queries import prepared

    def build() -> DataFrame:
        store = ensure_posting_index(spark, sf_dir)
        terms = sorted({T.stem_py(t) for t in FTS_QUERY_TERMS})
        buckets = sorted({store.bucket_of(t) for t in terms})
        idx = store.read(spark, buckets=buckets).filter(F.col("term").isin(terms))
        scored = idx.groupBy("doc_id").agg(
            F.round(F.sum(F.col("tf") * F.col("weight")), 2).alias("rank_score"),
            F.countDistinct("term").alias("terms_matched"),
        )
        return (
            scored.orderBy(F.desc("rank_score"), F.asc("doc_id"))
            .limit(20)
            .select("doc_id", "rank_score", "terms_matched")
        )

    return prepared(spark, "fts_posting_search", sf_dir, ("documents.parquet",), build)


def fts_porter_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20/F21 with the FULL Porter (1980) analyzer
    (:mod:`car_etl_spark.functions.porter`) — the real-stemming parity
    path for the reference's ``english`` tsvector configuration
    (``044_keyword_search.sql:22-34``), closing the declared deviation
    of the 3-rule suffix stemmer.  Porter conflates whole inflection
    families the suffix rules cannot ("merges"/"merging"/"merged" all
    stem to "merg"; suffix-stemming maps them to two different stems),
    so this query's recall set is a strict superset of
    :func:`fts_posting_search`'s wherever inflection differs.

    Serving shape is identical: a dedicated porter posting store
    (coexisting content-addressed with the suffix store), driver-side
    query stemming via :func:`porter_py`, bucket pruning on the stemmed
    term, weighted-tf scoring over the pruned partitions.  The oracle
    twin re-derives the postings in DuckDB with the SAME algorithm
    compiled to SQL (``porter_sql_stages``) — the tri-backend
    equivalence is separately property-tested in ``tests/test_porter``."""
    from car_etl_spark.functions.porter import porter_py
    from car_etl_spark.queries import prepared

    def build() -> DataFrame:
        store = ensure_posting_index(spark, sf_dir, analyzer="porter")
        terms = sorted({porter_py(t) for t in FTS_QUERY_TERMS})
        buckets = sorted({store.bucket_of(t) for t in terms})
        idx = store.read(spark, buckets=buckets).filter(F.col("term").isin(terms))
        scored = idx.groupBy("doc_id").agg(
            F.round(F.sum(F.col("tf") * F.col("weight")), 2).alias("rank_score"),
            F.countDistinct("term").alias("terms_matched"),
        )
        return (
            scored.orderBy(F.desc("rank_score"), F.asc("doc_id"))
            .limit(20)
            .select("doc_id", "rank_score", "terms_matched")
        )

    return prepared(spark, "fts_porter_search", sf_dir, ("documents.parquet",), build)


def fts_plainto_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL match semantics: ``plainto_tsquery``
    ANDs every stemmed term (``044_keyword_search.sql:78-80`` — a doc
    matches only if it contains ALL query terms), then ranks matches.
    The OR-scored queries rank by coverage; this one FILTERS to
    full-coverage docs (HAVING count(distinct term) == |terms|) over
    the porter posting store and ranks by the same weighted tf.

    Same serving cost shape: bucket-pruned posting join; the AND
    filter is a post-aggregation HAVING on the tiny matched set."""
    from car_etl_spark.functions.porter import porter_py
    from car_etl_spark.queries import prepared

    def build() -> DataFrame:
        store = ensure_posting_index(spark, sf_dir, analyzer="porter")
        terms = sorted({porter_py(t) for t in FTS_QUERY_TERMS})
        buckets = sorted({store.bucket_of(t) for t in terms})
        idx = store.read(spark, buckets=buckets).filter(F.col("term").isin(terms))
        scored = (
            idx.groupBy("doc_id")
            .agg(
                F.round(F.sum(F.col("tf") * F.col("weight")), 2).alias("rank_score"),
                F.countDistinct("term").alias("terms_matched"),
            )
            .filter(F.col("terms_matched") == len(terms))
        )
        return (
            scored.orderBy(F.desc("rank_score"), F.asc("doc_id"))
            .limit(20)
            .select("doc_id", "rank_score", "terms_matched")
        )

    return prepared(spark, "fts_plainto_search", sf_dir, ("documents.parquet",), build)


def fts_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranking over the porter posting store — the scoring
    function the rest of the industry serves (Lucene/Elasticsearch
    default), beyond the reference's ``ts_rank`` weighted-tf
    (``044_keyword_search.sql:78-90``).  idf = ln(1 + (N−df+½)/(df+½)),
    tf saturation k1=1.2, length normalization b=0.75 against the
    weighted doc length ``dl`` that rides on every posting row.

    Serving shape: same bucket-pruned read as :func:`fts_porter_search`
    — df comes from the pruned rows themselves, (N, avgdl) are meta
    constants stamped exactly at build/apply/compact — so per-call cost
    stays ∝ matched postings at any corpus size.  The oracle twin
    re-derives everything (postings, dl, N, avgdl, df) from raw text in
    DuckDB; scores round HALF-UP to 2 dp on both sides, absorbing
    cross-libm ``ln`` ulp and sum-order noise."""
    from car_etl_spark.functions.porter import porter_py
    from car_etl_spark.queries import prepared

    def build() -> DataFrame:
        store = ensure_posting_index(spark, sf_dir, analyzer="porter")
        terms = sorted({porter_py(t) for t in FTS_QUERY_TERMS})
        return store.bm25_search(spark, terms, limit=20)

    return prepared(spark, "fts_bm25_search", sf_dir, ("documents.parquet",), build)


#: the phrase benchmark query — present at every SF (~30 docs match)
FTS_PHRASE = ("table", "scan")


def fts_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search (``phraseto_tsquery`` / Lucene PhraseQuery)
    over the positional porter posting store: docs where the stemmed
    phrase terms occur at consecutive token positions, ranked by
    occurrence count.  One bucket-pruned pass; adjacency is array
    arithmetic on the per-(doc, term) position lists (flattened across
    the header/body weight split, so boundary-crossing phrases match).
    The oracle twin re-derives stemmed token positions from raw text
    and replays the same arithmetic in DuckDB list functions."""
    from car_etl_spark.functions.porter import porter_py
    from car_etl_spark.queries import prepared

    def build() -> DataFrame:
        store = ensure_posting_index(spark, sf_dir, analyzer="porter")
        terms = [porter_py(t) for t in FTS_PHRASE]
        return store.phrase_search(spark, terms, limit=20)

    return prepared(spark, "fts_phrase_search", sf_dir, ("documents.parquet",), build)


def fts_posting_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 BUILD-PATH TWIN: the same weighted-tf relevance derived from
    the raw corpus per call — the shape used before the posting table
    exists (and the oracle-checked proof that the serving path's
    persisted rollup changes nothing).

    The term predicate is applied BEFORE the posting aggregation (the
    index-scan equivalent: a GIN lookup never materializes the full
    posting list either), and the token rows come from
    split+posexplode+relational filter rather than exploding a
    higher-order tokenize array — the generator input stays in codegen
    (same trap as the MinHash shingle build; ~1.8x faster at sf0.1).
    Token semantics are identical: split on whitespace of the trimmed
    string yields no empty tokens, so positions match ``tokenize``.

    Both corpus tokens and query terms are stemmed, so plural/singular
    variants match ("windows" hits "window").  Cost control: every stem
    rule strips a SUFFIX, so stem(t) is always a prefix of t — any
    token that can stem into a query term must START with that stem.
    A cheap ``startswith`` prefilter therefore runs over all exploded
    tokens (plain JVM string compare), and the 3-regex stemmer + ISIN
    only touch the surviving handful (measured ~2x on this query at
    sf0.1 vs stemming every token)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    terms = sorted({T.stem_py(t) for t in FTS_QUERY_TERMS})
    prefix_guard = None
    for t in terms:
        c = F.col("raw_term").startswith(t)
        prefix_guard = c if prefix_guard is None else (prefix_guard | c)
    # strip LEADING whitespace explicitly: trim()/TRIM remove spaces
    # only, so text starting with a tab/newline would otherwise emit an
    # empty token at pos 0 and shift every position by one relative to
    # the oracle (which list_filters empties BEFORE numbering)
    cleaned = F.regexp_replace(F.lower(F.col("text")), r"^\s+", "")
    posted = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(cleaned, r"\s+")).alias("pos", "raw_term"),
        )
        .filter(prefix_guard)
        .withColumn("term", T.stem(F.col("raw_term")))
        .filter(F.col("term").isin(terms))
    )
    weighted = posted.withColumn(
        "weight",
        F.when(F.col("pos") < HEADER_TOKENS, F.lit(HEADER_WEIGHT)).otherwise(F.lit(BODY_WEIGHT)),
    )
    # SUM(tf * weight) grouped by (term, weight) == SUM(weight) over the
    # raw matched rows, so the per-(doc,term,weight) posting rollup adds
    # a shuffle without changing the score — ONE aggregation does it
    # (weights are small integers in double: addition is exact, so the
    # regrouping is bit-identical, which the oracle hash confirms).
    scored = weighted.groupBy("doc_id").agg(
        F.round(F.sum("weight"), 2).alias("rank_score"),
        F.countDistinct("term").alias("terms_matched"),
    )
    return (
        scored.orderBy(F.desc("rank_score"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "rank_score", "terms_matched")
    )


FTS_POSTING_SEARCH_SQL = f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(TRIM(LOWER(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks
  FROM documents
), posted AS (
  SELECT doc_id,
         unnest(toks) AS raw_term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM toked
), stemmed AS (
  SELECT doc_id, pos, {T.stem_sql('raw_term')} AS term FROM posted
), weighted AS (
  SELECT doc_id, term,
         CASE WHEN pos < {HEADER_TOKENS} THEN {HEADER_WEIGHT} ELSE {BODY_WEIGHT} END AS weight
  FROM stemmed
), postings AS (
  SELECT doc_id, term, weight, COUNT(*) AS tf
  FROM weighted GROUP BY doc_id, term, weight
), scored AS (
  SELECT doc_id,
         ROUND(SUM(tf * weight), 2) AS rank_score,
         COUNT(DISTINCT term) AS terms_matched
  FROM postings WHERE term IN ('spark', 'window', 'merge')
  GROUP BY doc_id
)
SELECT doc_id, rank_score, terms_matched
FROM scored
ORDER BY rank_score DESC, doc_id ASC
LIMIT 20
"""


#: the batch serving workload: N named queries answered in ONE pass
#: over the pruned posting partitions (the keyword analog of
#: vector_topk_batch — throughput mode for offline eval / re-ranking)
FTS_BATCH_QUERIES: dict[str, tuple[str, ...]] = {
    "q_infra": ("spark", "windows"),
    "q_merge": ("merges", "join"),
    "q_stream": ("stream", "batch"),
}


def fts_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch keyword retrieval: all queries' stemmed terms union into
    one bucket-pruned posting scan, a broadcast (query_id, term) map
    fans rows out to their queries, and a per-query window takes the
    top 5 — one job, one store pass, N result lists.  At 100 TB this is
    the offline-eval / bulk-rerank shape: cost scales with the UNION of
    matched postings, not with the query count."""
    from car_etl_spark.queries import prepared

    def build() -> DataFrame:
        return _fts_batch_search_core(spark, sf_dir).orderBy(
            "query_id", F.desc("rank_score"), F.asc("doc_id")
        )

    return prepared(spark, "fts_batch_search", sf_dir, ("documents.parquet",), build)


def _fts_batch_search_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered core of :func:`fts_batch_search` — the FTS suite
    consumes this so the arm's declared sort (dead under its union, and
    paying a range-bound sampling job that re-executes the rank-window
    stage) never enters the plan (r13; the r12 lsh-suite pattern).
    prepared() like the public form (plan-build stems terms and prunes
    buckets driver-side)."""
    from car_etl_spark.queries import prepared

    return prepared(
        spark, "fts_batch_search#core", sf_dir, ("documents.parquet",),
        lambda: _fts_batch_search_build(spark, sf_dir),
    )


def _fts_batch_search_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    store = ensure_posting_index(spark, sf_dir)
    pairs = sorted(
        {(qid, T.stem_py(t)) for qid, ts in FTS_BATCH_QUERIES.items() for t in ts}
    )
    all_terms = sorted({t for _q, t in pairs})
    buckets = sorted({store.bucket_of(t) for t in all_terms})
    qterms = spark.createDataFrame(pairs, "query_id string, term string")
    idx = store.read(spark, buckets=buckets).filter(F.col("term").isin(all_terms))
    scored = (
        idx.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(F.col("tf") * F.col("weight")), 2).alias("rank_score"),
            F.countDistinct("term").alias("terms_matched"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rank_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "doc_id", "rank_score", "terms_matched")
    )


def _fts_batch_sql() -> str:
    pairs = sorted(
        {(qid, T.stem_py(t)) for qid, ts in FTS_BATCH_QUERIES.items() for t in ts}
    )
    values = ", ".join(f"('{q}', '{t}')" for q, t in pairs)
    in_list = ", ".join(f"'{t}'" for t in sorted({t for _q, t in pairs}))
    return f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(TRIM(LOWER(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks
  FROM documents
), posted AS (
  SELECT doc_id,
         unnest(toks) AS raw_term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM toked
), weighted AS (
  SELECT doc_id, {T.stem_sql('raw_term')} AS term,
         CASE WHEN pos < {HEADER_TOKENS} THEN {HEADER_WEIGHT} ELSE {BODY_WEIGHT} END AS weight
  FROM posted
), qterms(query_id, term) AS (VALUES {values}),
scored AS (
  SELECT q.query_id, w.doc_id,
         ROUND(SUM(w.weight), 2) AS rank_score,
         COUNT(DISTINCT w.term) AS terms_matched
  FROM weighted w JOIN qterms q ON w.term = q.term
  WHERE w.term IN ({in_list})
  GROUP BY q.query_id, w.doc_id
)
SELECT query_id, doc_id, rank_score, terms_matched
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY rank_score DESC, doc_id ASC
  ) AS rn
  FROM scored
)
WHERE rn <= 5
ORDER BY query_id, rank_score DESC, doc_id ASC
"""


FTS_BATCH_SEARCH_SQL = _fts_batch_sql()


def _porter_search_sql(require_all: bool = False) -> str:
    """The porter-analyzer oracle: identical posting derivation, with
    the Porter steps compiled to SQL and staged through chained
    subqueries (one per algorithm step, mirroring the Spark staging —
    inlining would blow the expression up exponentially)."""
    from car_etl_spark.functions.porter import (
        porter_py,
        porter_sql_guard,
        porter_sql_stages,
    )

    terms = sorted({porter_py(t) for t in FTS_QUERY_TERMS})
    in_list = ", ".join(f"'{t}'" for t in terms)
    stages = porter_sql_stages("raw_term")
    chain = "SELECT * FROM rolled"
    for name, expr in stages:
        chain = f"SELECT *, {expr} AS {name} FROM ({chain})"
    guard = porter_sql_guard("raw_term", stages[-1][0])
    # stem the ROLLED (doc, raw_term, weight) rows, not every token
    # occurrence — same rollup-before-stem shape as build_posting_rows.
    # Both CTEs are MATERIALIZED: without the barrier DuckDB flattens
    # the aggregate subquery into the 8 chained porter projections and
    # the expression tree inflates past any practical planning budget
    # (observed: sub-second with barriers, hung without).
    return f"""
WITH rolled AS MATERIALIZED (
  SELECT doc_id, raw_term, weight, COUNT(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(toks) AS raw_term,
           CASE WHEN generate_subscripts(toks, 1) - 1 < {HEADER_TOKENS} THEN {HEADER_WEIGHT} ELSE {BODY_WEIGHT} END AS weight
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(TRIM(LOWER(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks
      FROM documents
    )
  )
  GROUP BY doc_id, raw_term, weight
), stemmed AS MATERIALIZED (
  SELECT doc_id, weight, tf, {guard} AS term FROM ({chain})
)
SELECT doc_id,
       ROUND(SUM(tf * weight), 2) AS rank_score,
       COUNT(DISTINCT term) AS terms_matched
FROM stemmed WHERE term IN ({in_list})
GROUP BY doc_id
{"HAVING COUNT(DISTINCT term) = " + str(len(terms)) if require_all else ""}
ORDER BY rank_score DESC, doc_id ASC
LIMIT 20
"""


FTS_PORTER_SEARCH_SQL = _porter_search_sql()
FTS_PLAINTO_SEARCH_SQL = _porter_search_sql(require_all=True)


def _bm25_search_sql() -> str:
    """The BM25 oracle: identical posting derivation to the porter
    oracle, then the full Okapi pipeline re-derived from raw text —
    doc lengths from the rolled token table, corpus (N, Σdl), per-term
    document frequencies, and the exact expression shape of
    ``PostingStore.bm25_search`` (operator-for-operator, so every
    IEEE intermediate matches; the 2 dp HALF-UP round absorbs the two
    engines' ``ln`` ulp difference)."""
    from car_etl_spark.functions.porter import (
        porter_py,
        porter_sql_guard,
        porter_sql_stages,
    )
    from car_etl_spark.operators.indexing import BM25_B, BM25_K1

    terms = sorted({porter_py(t) for t in FTS_QUERY_TERMS})
    in_list = ", ".join(f"'{t}'" for t in terms)
    stages = porter_sql_stages("raw_term")
    chain = "SELECT * FROM rolled"
    for name, expr in stages:
        chain = f"SELECT *, {expr} AS {name} FROM ({chain})"
    guard = porter_sql_guard("raw_term", stages[-1][0])
    return f"""
WITH rolled AS MATERIALIZED (
  SELECT doc_id, raw_term, weight, COUNT(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(toks) AS raw_term,
           CASE WHEN generate_subscripts(toks, 1) - 1 < {HEADER_TOKENS} THEN {HEADER_WEIGHT} ELSE {BODY_WEIGHT} END AS weight
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(TRIM(LOWER(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks
      FROM documents
    )
  )
  GROUP BY doc_id, raw_term, weight
), stemmed AS MATERIALIZED (
  SELECT doc_id, weight, tf, {guard} AS term FROM ({chain})
), doclen AS MATERIALIZED (
  SELECT doc_id, SUM(tf * weight) AS dl FROM rolled GROUP BY doc_id
), corpus AS MATERIALIZED (
  SELECT COUNT(*) AS n, SUM(dl) AS sdl FROM doclen
), matched AS MATERIALIZED (
  SELECT doc_id, term, SUM(tf * weight) AS tfw
  FROM stemmed WHERE term IN ({in_list})
  GROUP BY doc_id, term
), dfreq AS MATERIALIZED (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM matched GROUP BY term
)
SELECT m.doc_id,
       FLOOR(SUM(
         LN(1.0 + (c.n - f.df + 0.5) / (f.df + 0.5))
         * (m.tfw * ({BM25_K1} + 1.0))
         / (m.tfw + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * d.dl / (c.sdl / c.n)))
       ) * 100 + 0.5) / 100 AS rank_score,
       COUNT(DISTINCT m.term) AS terms_matched
FROM matched m
JOIN doclen d ON m.doc_id = d.doc_id
JOIN dfreq f ON m.term = f.term
CROSS JOIN corpus c
GROUP BY m.doc_id
ORDER BY rank_score DESC, m.doc_id ASC
LIMIT 20
"""


FTS_BM25_SEARCH_SQL = _bm25_search_sql()


def _phrase_search_sql() -> str:
    """The phrase oracle: stemmed token positions re-derived from raw
    text (same rollup-before-stem shape as the porter oracle, keeping
    positions as lists), then the identical adjacency arithmetic in
    DuckDB list functions."""
    from car_etl_spark.functions.porter import (
        porter_py,
        porter_sql_guard,
        porter_sql_stages,
    )

    terms = [porter_py(t) for t in FTS_PHRASE]
    stages = porter_sql_stages("raw_term")
    chain = "SELECT * FROM rolled"
    for name, expr in stages:
        chain = f"SELECT *, {expr} AS {name} FROM ({chain})"
    guard = porter_sql_guard("raw_term", stages[-1][0])
    arm_ctes = ", ".join(
        f"""p{i} AS MATERIALIZED (
  SELECT doc_id, flatten(list(positions)) AS pos
  FROM stemmed WHERE term = '{t}' GROUP BY doc_id
)"""
        for i, t in enumerate(terms)
    )
    joins = " ".join(
        f"JOIN p{i} ON p0.doc_id = p{i}.doc_id" for i in range(1, len(terms))
    )
    adj = " AND ".join(
        f"list_contains(p{i}.pos, p + {i})" for i in range(1, len(terms))
    )
    return f"""
WITH rolled AS MATERIALIZED (
  SELECT doc_id, raw_term, list(pos) AS positions
  FROM (
    SELECT doc_id,
           unnest(toks) AS raw_term,
           generate_subscripts(toks, 1) - 1 AS pos
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(TRIM(LOWER(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks
      FROM documents
    )
  )
  GROUP BY doc_id, raw_term
), stemmed AS MATERIALIZED (
  SELECT doc_id, positions, {guard} AS term FROM ({chain})
), {arm_ctes}, counted AS (
  SELECT p0.doc_id,
         len(list_filter(p0.pos, p -> {adj})) AS phrase_count
  FROM p0 {joins}
)
SELECT doc_id, CAST(phrase_count AS DOUBLE) AS rank_score,
       CAST({len(terms)} AS BIGINT) AS terms_matched
FROM counted WHERE phrase_count > 0
ORDER BY rank_score DESC, doc_id ASC
LIMIT 20
"""


FTS_PHRASE_SEARCH_SQL = _phrase_search_sql()


def cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: apply a change stream with delete markers — per user, the
    latest event wins; if it is a tombstone ('error' here) the key is
    deleted from the materialized state.  Output: surviving keys with
    their last value and change count."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.round("value", 2).alias("last_value"),
        )
    )
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("change_count"))
    return (
        latest.filter(F.col("last_event_type") != "error")  # tombstoned keys drop
        .join(counts, "user_id")
        .select("user_id", "last_event_type", "last_value", "change_count")
        .orderBy("user_id")
    )


CDC_TOMBSTONES_SQL = """
WITH latest AS (
  SELECT user_id, event_type AS last_event_type, ROUND(value, 2) AS last_value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), counts AS (
  SELECT user_id, COUNT(*) AS change_count FROM events GROUP BY user_id
)
SELECT l.user_id, l.last_event_type, l.last_value, c.change_count
FROM latest l JOIN counts c ON l.user_id = c.user_id
WHERE l.rn = 1 AND l.last_event_type <> 'error'
ORDER BY l.user_id
"""


# the seven FTS variants registered through suites.fts_search_suite
# since round 5 (registry consolidation, COVERAGE.md merge table);
# the functions remain the per-mode serving API and bench surface
QUERIES: dict[str, QuerySpec] = {
    "cdc_apply_tombstones": QuerySpec(cdc_apply_tombstones, CDC_TOMBSTONES_SQL, ("cdc",)),
}
