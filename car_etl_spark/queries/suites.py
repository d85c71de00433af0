"""Consolidated registry suites — one driver slot per same-grain family.

The external driver's correctness window is 50 entries; the registry
had outgrown it (67 in round 4, leaving 17 queries without an external
hard-signal row).  This module applies the round-2 playbook a second
time: queries sharing a grain are UNION-tagged (a ``mode``/``method``
column distinguishes arms, every arm's sub-expression unchanged) and
same-key metric sets are JOINED into one wide report, so every registry
entry gets a driver CORRECTNESS row every round.  The constituent
functions remain exported from their home modules (and benched
individually by ``bench.py``); the old name -> suite mapping is in
COVERAGE.md.

A union suite is also a real serving artifact, not just bookkeeping:
the arms prove serving == scan (posting store vs raw-text twins) and
exact == ANN (brute force vs certified IVF probe) inside ONE
hash-checked result, so a value regression in any arm, or any
divergence BETWEEN arms, flips the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_etl_spark.queries import QuerySpec


def _tagged_union(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _suite_sorted(df: DataFrame, part_cols: list[str], order_cols: list) -> DataFrame:
    """Hash-materialize a suite union below its single declared sort.

    A global ``orderBy`` directly on the union compiles to a range
    Exchange whose bound-sampling job re-executes every arm's result
    stage (the r12 §2/§10d sampling tax); hash-repartitioning the
    (small, tagged) result rows first materializes the union once and
    the sampler re-reads shuffle files.  Every suite's sort keys are
    its unique grain, so the declared order is a total order and the
    returned rows/order are unchanged (proven pattern:
    ``lsh_neardup_suite`` −20 % at sf1 in r12)."""
    return df.repartition(*part_cols).orderBy(*order_cols)


# ---------------------------------------------------------------------------
# FTS: five search modes, one slot


def fts_search_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20/F21 suite: suffix-analyzer serving + its raw-text scan twin,
    Porter serving, plainto AND-semantics, and the batch union scan —
    all (query_id, doc_id, rank_score, terms_matched) rows in one
    result.  serving == scan parity is part of the hash."""
    from car_etl_spark.queries.fts import (
        _fts_batch_search_core,
        fts_bm25_search,
        fts_phrase_search,
        fts_plainto_search,
        fts_porter_search,
        fts_posting_scan,
        fts_posting_search,
    )

    # the six single-query arms keep their public forms: their sorts
    # are TakeOrderedAndProject (required by the limit), not range
    # sorts.  The batch arm's declared sort IS a dead range sort under
    # this union — it is consumed through its unordered core (r13).
    arms = [
        ("suffix_serving", fts_posting_search),
        ("suffix_scan", fts_posting_scan),
        ("porter", fts_porter_search),
        ("plainto", fts_plainto_search),
        ("bm25", fts_bm25_search),
        ("phrase", fts_phrase_search),
    ]
    parts = [
        fn(spark, sf_dir).select(
            F.lit(tag).alias("query_id"), "doc_id", "rank_score", "terms_matched"
        )
        for tag, fn in arms
    ]
    parts.append(
        _fts_batch_search_core(spark, sf_dir).select(
            "query_id", "doc_id", "rank_score", "terms_matched"
        )
    )
    return _suite_sorted(
        _tagged_union(parts),
        ["query_id", "rank_score", "doc_id"],
        ["query_id", F.desc("rank_score"), F.asc("doc_id")],
    )


def _fts_suite_sql() -> str:
    from car_etl_spark.queries.fts import (
        FTS_BATCH_SEARCH_SQL,
        FTS_BM25_SEARCH_SQL,
        FTS_PHRASE_SEARCH_SQL,
        FTS_PLAINTO_SEARCH_SQL,
        FTS_PORTER_SEARCH_SQL,
        FTS_POSTING_SEARCH_SQL,
    )

    arms = [
        ("suffix_serving", FTS_POSTING_SEARCH_SQL),
        ("suffix_scan", FTS_POSTING_SEARCH_SQL),
        ("porter", FTS_PORTER_SEARCH_SQL),
        ("plainto", FTS_PLAINTO_SEARCH_SQL),
        ("bm25", FTS_BM25_SEARCH_SQL),
        ("phrase", FTS_PHRASE_SEARCH_SQL),
    ]
    parts = [
        f"SELECT '{tag}' AS query_id, doc_id, rank_score, terms_matched FROM ({sql})"
        for tag, sql in arms
    ]
    parts.append(
        "SELECT query_id, doc_id, rank_score, terms_matched "
        f"FROM ({FTS_BATCH_SEARCH_SQL})"
    )
    return (
        "SELECT * FROM (\n" + "\nUNION ALL\n".join(parts)
        + "\n) ORDER BY query_id, rank_score DESC, doc_id ASC"
    )


# ---------------------------------------------------------------------------
# Vector: exact / IVF-serving / adaptive dispatch, one slot


def vector_topk_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 suite: brute-force exact, certified-exact IVF serving, the
    cost-based adaptive dispatch, and (r7) the certified-exact
    PRODUCT-QUANTIZED serving arm — four arms that must agree row-for-
    row, all sharing the brute-force oracle — plus the metadata-
    FILTERED serving arm (per-(centroid, label) counts certify the
    probe walk over matching members; its oracle is the filtered brute
    force), tagged and unioned — and (r8) the COMBINED tenant x filter
    arm: tenant RLS + metadata filter certified in one scan from the
    tenant-partitioned store's per-(tenant, centroid, value) counts
    (the reference's match_document_chunks shape,
    042_match_function.sql:23-41; the tenant split is vec_id parity so
    the tenant+filter brute force is SQL-recomputable)."""
    from car_etl_spark.queries.vector import (
        vector_filtered_topk,
        vector_ivf_topk,
        vector_pq_topk,
        vector_tenant_filtered_topk,
        vector_topk,
        vector_topk_adaptive,
    )

    arms = [
        ("exact", vector_topk),
        ("ivf", vector_ivf_topk),
        ("adaptive", vector_topk_adaptive),
        ("filtered", vector_filtered_topk),
        ("pq", vector_pq_topk),
        ("tenant_filtered", vector_tenant_filtered_topk),
    ]
    parts = [
        fn(spark, sf_dir).select(
            F.lit(tag).alias("mode"), "vec_id", "label", "cosine_sim"
        )
        for tag, fn in arms
    ]
    # r13 examined, left alone: the arms are TakeOrdered-limited serving
    # reads whose single-partition outputs compile to a Sort with NO
    # range exchange below (plans/r13/vector_topk_modes_before.txt) —
    # there is no bound-sampling job to remove, and _suite_sorted would
    # ADD two exchanges to a ~120-row result
    return _tagged_union(parts).orderBy("mode", F.desc("cosine_sim"), F.asc("vec_id"))


def _vector_modes_sql() -> str:
    from car_etl_spark.queries.vector import (
        VECTOR_FILTERED_TOPK_SQL,
        VECTOR_TENANT_FILTERED_TOPK_SQL,
        VECTOR_TOPK_SQL,
    )

    parts = [
        f"SELECT '{tag}' AS mode, vec_id, label, cosine_sim FROM ({VECTOR_TOPK_SQL})"
        for tag in ("exact", "ivf", "adaptive", "pq")
    ] + [
        "SELECT 'filtered' AS mode, vec_id, label, cosine_sim "
        f"FROM ({VECTOR_FILTERED_TOPK_SQL})",
        "SELECT 'tenant_filtered' AS mode, vec_id, label, cosine_sim "
        f"FROM ({VECTOR_TENANT_FILTERED_TOPK_SQL})",
    ]
    return (
        "SELECT * FROM (\n" + "\nUNION ALL\n".join(parts)
        + "\n) ORDER BY mode, cosine_sim DESC, vec_id ASC"
    )


def vector_label_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-grain report: full-corpus similarity + norm-hygiene profile
    LEFT JOINed with the k-NN top-50 label vote — the cluster-quality
    and classification read-paths in one slot (labels outside the
    top-50 carry 0 votes)."""
    from car_etl_spark.queries.vector import (
        vector_knn_label_vote,
        vector_label_profile,
    )

    prof = vector_label_profile(spark, sf_dir)
    votes = vector_knn_label_vote(spark, sf_dir).select(
        "label",
        F.col("votes").alias("knn_votes"),
        F.col("avg_sim").alias("knn_avg_sim"),
    )
    # r13 examined, left alone: a repartition("label") below the sort is
    # ELIMINATED by Catalyst (the profile side's agg exchange already
    # hash-partitions on label, so the user repartition is redundant and
    # removed — verified, plan unchanged); the sort's sampling job only
    # re-runs the final agg read + the broadcast probe, which the
    # existing exchange already bounds
    return (
        prof.join(votes, "label", "left")
        .withColumn("knn_votes", F.coalesce(F.col("knn_votes"), F.lit(0)).cast("long"))
        .orderBy("label")
    )


def _vector_label_report_sql() -> str:
    from car_etl_spark.queries.vector import (
        VECTOR_KNN_LABEL_VOTE_SQL,
        VECTOR_LABEL_PROFILE_SQL,
    )

    return f"""
SELECT p.*, CAST(COALESCE(v.votes, 0) AS BIGINT) AS knn_votes,
       v.avg_sim AS knn_avg_sim
FROM ({VECTOR_LABEL_PROFILE_SQL}) p
LEFT JOIN ({VECTOR_KNN_LABEL_VOTE_SQL}) v ON p.label = v.label
ORDER BY p.label
"""


# ---------------------------------------------------------------------------
# Documents: quality + repetition (doc grain), keyword modes (result page)


def doc_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-grain curation report: length/diversity/stop-word quality
    composite JOINed with the Gopher-style repetition fractions — one
    slot, one hash, both metric families (docs need >= 2 tokens for a
    bigram, matching the repetition profile's row set)."""
    from car_etl_spark.queries.textops import (
        _doc_quality_scores_core,
        doc_repetition_profile,
    )

    q = _doc_quality_scores_core(spark, sf_dir)
    r = doc_repetition_profile(spark, sf_dir).drop("n_tokens")
    # r13: q consumed through its core — its _pair_sorted repartition
    # was a dead full shuffle feeding a broadcast join — and the joined
    # doc-grain rows are hash-materialized once below the declared sort
    return _suite_sorted(q.join(r, "doc_id"), ["doc_id"], ["doc_id"])


def _doc_quality_repetition_sql() -> str:
    from car_etl_spark.queries.textops import DOC_QUALITY_SQL, DOC_REPETITION_SQL

    return f"""
SELECT q.doc_id, q.lang, q.token_count, q.stopword_ratio, q.quality_score,
       r.distinct_frac, r.top_token_frac, r.top_bigram_frac, r.repetitive
FROM ({DOC_QUALITY_SQL}) q
JOIN ({DOC_REPETITION_SQL}) r ON q.doc_id = r.doc_id
ORDER BY q.doc_id
"""


def doc_keyword_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword result-page suite: posting-store serving, raw-text scan
    twin, the highlighted-snippet page (F17+F19), and (r7) EXACT
    substring search from the trigram store — tagged arms on one
    (mode, doc_id, lang, score, snippet) grain.  The substring arm's
    oracle is a character-window scan of the raw text, so the
    index-side adjacency verification is hash-proved against ILIKE
    semantics."""
    from car_etl_spark.queries.textops import (
        _doc_regex_search_core,
        _doc_search_highlight_core,
        _doc_substring_search_core,
        doc_keyword_scan,
        doc_keyword_search,
    )

    # r13: the serving/scan arms keep their public forms (their sorts
    # are TakeOrderedAndProject, required by the limit); the highlight/
    # substring/regex arms' declared sorts were dead range sorts under
    # this union, each re-running its verify stage in the range
    # sampler — consumed through unordered cores instead
    null_s = F.lit(None).cast("string")
    parts = [
        doc_keyword_search(spark, sf_dir).select(
            F.lit("serving").alias("mode"), "doc_id", "lang", "score",
            null_s.alias("snippet"),
        ),
        doc_keyword_scan(spark, sf_dir).select(
            F.lit("scan").alias("mode"), "doc_id", "lang", "score",
            null_s.alias("snippet"),
        ),
        _doc_search_highlight_core(spark, sf_dir).select(
            F.lit("highlight").alias("mode"), "doc_id", null_s.alias("lang"),
            "score", "snippet",
        ),
        _doc_substring_search_core(spark, sf_dir).select(
            F.lit("substring").alias("mode"), "doc_id", "lang",
            F.col("n_matches").cast("double").alias("score"),
            null_s.alias("snippet"),
        ),
        _doc_regex_search_core(spark, sf_dir).select(
            F.lit("regex").alias("mode"), "doc_id", "lang",
            F.col("n_matches").cast("double").alias("score"),
            null_s.alias("snippet"),
        ),
    ]
    return _suite_sorted(
        _tagged_union(parts),
        ["mode", "score", "doc_id"],
        ["mode", F.desc("score"), F.asc("doc_id")],
    )


def _doc_keyword_modes_sql() -> str:
    from car_etl_spark.queries.textops import (
        DOC_KEYWORD_SEARCH_SQL,
        DOC_SEARCH_HIGHLIGHT_SQL,
        DOC_REGEX_SEARCH_SQL,
        DOC_SUBSTRING_SEARCH_SQL,
    )

    return f"""
SELECT * FROM (
SELECT 'serving' AS mode, doc_id, lang, score, CAST(NULL AS VARCHAR) AS snippet
FROM ({DOC_KEYWORD_SEARCH_SQL})
UNION ALL
SELECT 'scan' AS mode, doc_id, lang, score, CAST(NULL AS VARCHAR) AS snippet
FROM ({DOC_KEYWORD_SEARCH_SQL})
UNION ALL
SELECT 'highlight' AS mode, doc_id, CAST(NULL AS VARCHAR) AS lang, score, snippet
FROM ({DOC_SEARCH_HIGHLIGHT_SQL})
UNION ALL
SELECT 'substring' AS mode, doc_id, lang, CAST(n_matches AS DOUBLE) AS score,
       CAST(NULL AS VARCHAR) AS snippet
FROM ({DOC_SUBSTRING_SEARCH_SQL})
UNION ALL
SELECT 'regex' AS mode, doc_id, lang, CAST(n_matches AS DOUBLE) AS score,
       CAST(NULL AS VARCHAR) AS snippet
FROM ({DOC_REGEX_SEARCH_SQL})
) ORDER BY mode, score DESC, doc_id ASC
"""


# ---------------------------------------------------------------------------
# Hybrid search: classic RRF + full index-resident porter/IVF stack


def hybrid_search_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/F23 suite: tf+brute-force RRF fusion and the index-resident
    porter+IVF fusion, tagged on one (mode, doc_id, rrf_score, kw_rank,
    vec_rank) grain."""
    from car_etl_spark.queries.search import (
        hybrid_porter_ivf_search,
        hybrid_rrf_search,
    )

    parts = [
        hybrid_rrf_search(spark, sf_dir).select(
            F.lit("rrf").alias("mode"), "doc_id", "rrf_score", "kw_rank", "vec_rank"
        ),
        hybrid_porter_ivf_search(spark, sf_dir).select(
            F.lit("porter_ivf").alias("mode"), "doc_id", "rrf_score",
            "kw_rank", "vec_rank",
        ),
    ]
    # r13 examined, left alone: both arms are single-partition fused
    # pages — the union's Sort carries NO range exchange
    # (plans/r13/hybrid_search_modes_before.txt), so there is no
    # sampling job to remove and _suite_sorted would add two exchanges
    return _tagged_union(parts).orderBy("mode", F.desc("rrf_score"), F.asc("doc_id"))


def _hybrid_modes_sql() -> str:
    from car_etl_spark.queries.search import HYBRID_PORTER_IVF_SQL, HYBRID_RRF_SQL

    return f"""
SELECT * FROM (
SELECT 'rrf' AS mode, doc_id, rrf_score, kw_rank, vec_rank FROM ({HYBRID_RRF_SQL})
UNION ALL
SELECT 'porter_ivf' AS mode, doc_id, rrf_score, kw_rank, vec_rank
FROM ({HYBRID_PORTER_IVF_SQL})
) ORDER BY mode, rrf_score DESC, doc_id ASC
"""


# ---------------------------------------------------------------------------
# Dedup: LSH candidate paths (rows-only) + exact blocked companions


def lsh_neardup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three LSH candidate generators — MinHash+LSH, SimHash subset
    blocking, hyperplane-LSH embeddings — tagged on one
    (method, id_a, id_b, score) grain.

    Since round 6 the suite serves from the PORTABLE hash family
    (operators/portable.py: md5-60bit + exact affine/integer
    arithmetic), which has a value-identical DuckDB twin — so this row
    is a FULL oracle row exercising signatures, banding, the candidate
    join, and verification end to end.  The xxhash64 production family
    keeps the hot path (benched fine-grained via minhash_lsh_neardup et
    al.); family recall equivalence is pinned in tests/test_portable.py,
    and the exact companions suite remains the brute-force ground
    truth."""
    from car_etl_spark.queries.dedup import (
        embedding_portable_neardup,
        minhash_portable_neardup,
        simhash_portable_neardup,
    )

    # arms consumed UNSORTED (r12): each arm's internal orderBy was a
    # dead sort under the union AND its range-bound sampling job
    # re-executed that arm's scoring stage (queries/dedup._pair_sorted
    # docstring); the union is hash-materialized once below the single
    # declared sort for the same reason
    parts = [
        minhash_portable_neardup(spark, sf_dir, ordered=False).select(
            F.lit("minhash_jaccard").alias("method"), "id_a", "id_b",
            F.round("jaccard", 6).alias("score"),
        ),
        simhash_portable_neardup(spark, sf_dir, ordered=False).select(
            F.lit("simhash_hamming").alias("method"), "id_a", "id_b",
            F.col("hamming").cast("double").alias("score"),
        ),
        embedding_portable_neardup(spark, sf_dir, ordered=False).select(
            F.lit("embedding_cosine").alias("method"), "id_a", "id_b",
            F.round("cosine_sim", 6).alias("score"),
        ),
    ]
    return (
        _tagged_union(parts)
        .repartition("method", "id_a", "id_b")
        .orderBy("method", "id_a", "id_b")
    )


def _lsh_neardup_suite_sql(sf_dir: str) -> str:
    """Oracle builder: the blocking/banding plans depend on the corpus
    footer counts, so the SQL is assembled per sf_dir with the SAME
    plan calls the Spark side makes."""
    from car_etl_spark.operators import portable as P
    from car_etl_spark.queries.dedup import portable_plan_rowcount

    nd = portable_plan_rowcount(sf_dir, "documents")
    ne = portable_plan_rowcount(sf_dir, "embeddings")
    return f"""
SELECT * FROM (
SELECT 'minhash_jaccard' AS method, id_a, id_b, ROUND(jaccard, 6) AS score
FROM ({P.portable_minhash_sql(threshold=0.5)})
UNION ALL
SELECT 'simhash_hamming' AS method, id_a, id_b, CAST(hamming AS DOUBLE) AS score
FROM ({P.portable_simhash_sql(nd)})
UNION ALL
SELECT 'embedding_cosine' AS method, id_a, id_b, ROUND(cosine_sim, 6) AS score
FROM ({P.portable_embedding_sql(ne)})
) ORDER BY method, id_a, id_b
"""


def exact_neardup_companions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked exact ground truth for the LSH suite — blocked
    token-set Jaccard and blocked embedding cosine — plus the
    prefix-filtered n-gram arm (round 7): EXACT UNBLOCKED 3-token-
    shingle Jaccard >= 0.8 via the All-Pairs prefix filter, the
    zero-recall-loss scale path the blocked arms approximate.  All on
    one (method, id_a, id_b, score) grain."""
    from car_etl_spark.queries.dedup import (
        embedding_neardup_exact_block,
        shingle_prefix_neardup,
        token_jaccard_blocked,
    )

    # arms consumed UNSORTED + union materialized below the single
    # declared sort — see lsh_neardup_suite / dedup._pair_sorted (r12)
    parts = [
        token_jaccard_blocked(spark, sf_dir, ordered=False).select(
            F.lit("token_jaccard").alias("method"), "id_a", "id_b",
            F.col("jaccard").alias("score"),
        ),
        embedding_neardup_exact_block(spark, sf_dir, ordered=False).select(
            F.lit("embedding_cosine").alias("method"), "id_a", "id_b",
            F.col("cosine_sim").alias("score"),
        ),
        shingle_prefix_neardup(spark, sf_dir, ordered=False).select(
            F.lit("shingle3_prefix_jaccard").alias("method"), "id_a", "id_b",
            F.col("jaccard").alias("score"),
        ),
    ]
    return (
        _tagged_union(parts)
        .repartition("method", "id_a", "id_b")
        .orderBy("method", "id_a", "id_b")
    )


def _exact_companions_sql(sf_dir: str) -> str:
    """Callable oracle (sf_dir-aware since r9): the token-Jaccard arm's
    block count is scale-derived from the corpus footer on BOTH
    engines (``dedup.jaccard_block_count``)."""
    from car_etl_spark.queries.dedup import (
        SHINGLE_PREFIX_SQL,
        embedding_neardup_exact_sql,
        token_jaccard_sql,
    )

    return f"""
SELECT * FROM (
SELECT 'token_jaccard' AS method, id_a, id_b, jaccard AS score
FROM ({token_jaccard_sql(sf_dir)})
UNION ALL
SELECT 'embedding_cosine' AS method, id_a, id_b, cosine_sim AS score
FROM ({embedding_neardup_exact_sql(sf_dir)})
UNION ALL
SELECT 'shingle3_prefix_jaccard' AS method, id_a, id_b, jaccard AS score
FROM ({SHINGLE_PREFIX_SQL})
) ORDER BY method, id_a, id_b
"""


# ---------------------------------------------------------------------------
# Events: windowed rollups (tumbling/sliding/daily cascade), profiles


def events_window_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All time-window rollups in one tagged slot: tumbling-1h,
    sliding-1h/30m (both from events_time_windows), the multi-
    resolution daily cascade (minute -> hour -> day re-aggregation,
    the continuous-aggregate shape), and (r7) the SAME daily cascade
    SERVED from the persisted rollup store
    (:mod:`car_etl_spark.streaming.rollup_store` — LSM-maintained
    minute partials, date-partitioned) — serving == scan for
    continuous aggregates, both arms against the raw->day oracle."""
    from car_etl_spark.queries.eventsq import (
        _events_multires_rollup_core,
        _events_time_windows_core,
    )
    from car_etl_spark.streaming.rollup_store import ensure_rollup_store

    # r13: arms consumed UNSORTED through their cores — the nested
    # events_time_windows union carried two per-arm sorts plus its own,
    # all dead under this suite's final sort, each paying a range-bound
    # sampling job (the r12 §10d defect)
    null_d = F.lit(None).cast("double")
    tw = _events_time_windows_core(spark, sf_dir).select(
        "window_kind", "window_start", "event_type", "n", "total_value",
        "active_users", null_d.alias("value_avg"), null_d.alias("value_max"),
    )
    mr = _events_multires_rollup_core(spark, sf_dir).select(
        F.lit("daily_cascade").alias("window_kind"),
        F.col("day").alias("window_start"),
        "event_type",
        F.col("n_events").alias("n"),
        F.col("value_sum").alias("total_value"),
        F.lit(None).cast("long").alias("active_users"),
        "value_avg",
        "value_max",
    )
    # served twin: identical finalization over the store's DECIMAL
    # partials (exact_sums) so the hash must equal the scan cascade's
    store = ensure_rollup_store(spark, sf_dir)
    served = store.read(spark, "day", exact_sums=True).select(
        F.lit("daily_cascade_served").alias("window_kind"),
        F.date_format("bucket_start", "yyyy-MM-dd").alias("window_start"),
        "event_type",
        F.col("n").alias("n"),
        F.round(F.col("value_sum"), 2).cast("double").alias("total_value"),
        F.lit(None).cast("long").alias("active_users"),
        F.round(
            F.col("value_sum").cast("double") / F.col("n"), 6
        ).alias("value_avg"),
        F.round("value_max", 2).alias("value_max"),
    )
    return _suite_sorted(
        tw.unionByName(mr).unionByName(served),
        ["window_kind", "window_start", "event_type"],
        ["window_kind", "window_start", "event_type"],
    )


def _events_window_rollups_sql() -> str:
    from car_etl_spark.queries.eventsq import (
        EVENTS_MULTIRES_SQL,
        EVENTS_TIME_WINDOWS_SQL,
    )

    return f"""
SELECT * FROM (
SELECT window_kind, window_start, event_type, n, total_value, active_users,
       CAST(NULL AS DOUBLE) AS value_avg, CAST(NULL AS DOUBLE) AS value_max
FROM ({EVENTS_TIME_WINDOWS_SQL})
UNION ALL
SELECT 'daily_cascade' AS window_kind, day AS window_start, event_type,
       n_events AS n, value_sum AS total_value, CAST(NULL AS BIGINT) AS active_users,
       value_avg, value_max
FROM ({EVENTS_MULTIRES_SQL})
UNION ALL
SELECT 'daily_cascade_served' AS window_kind, day AS window_start, event_type,
       n_events AS n, value_sum AS total_value, CAST(NULL AS BIGINT) AS active_users,
       value_avg, value_max
FROM ({EVENTS_MULTIRES_SQL})
) ORDER BY window_kind, window_start, event_type
"""


def events_rollup_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily cascade SERVED from the persisted rollup store alone —
    the continuous-aggregate dashboard read (bench surface; its
    correctness rides the `daily_cascade_served` arm of
    events_window_rollups).  Reads minute partials, never raw events.

    r12: plan memoized via ``prepared()`` like every other serving mode
    — it was the one SERVING_MODE_NAMES entry rebuilding plan +
    analysis + file listing per call, which is exactly the cost the
    warm-boot hook cannot pre-pay for an unmemoized query (the r11
    cold-boot worst mode, prepared-first 1.85x warm at sf1)."""
    from car_etl_spark.queries import prepared
    from car_etl_spark.streaming.rollup_store import ensure_rollup_store

    def build() -> DataFrame:
        store = ensure_rollup_store(spark, sf_dir)
        return store.read(spark, "day").orderBy("bucket_start", "event_type")

    return prepared(
        spark, "events_rollup_served", sf_dir, ("events.parquet",), build
    )


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group event profiles in one tagged slot: the JSON-prop bucket
    rollup (F15), the exact per-type value percentiles, and the
    bounded-state histogram-quantile sketch (same columns, so exact vs
    estimate sit one tag apart in the hashed result), harmonized on
    (kind, group_key, n, avg_value, p50/p90/p99/max)."""
    from car_etl_spark.queries.eventsq import (
        _events_hist_quantiles_core,
        _events_json_props_core,
        _events_user_cms_freq_core,
        _events_user_exact_freq_core,
        _events_value_percentiles_core,
    )

    # r13: all five arms consumed UNSORTED through their cores (each
    # per-arm sort was dead under this union and paid its own
    # range-bound sampling job — the r12 §10d defect)
    null_d = F.lit(None).cast("double")
    jp = _events_json_props_core(spark, sf_dir).select(
        F.lit("json_k_bucket").alias("kind"),
        F.col("k_bucket").cast("string").alias("group_key"),
        "n",
        "avg_value",
        null_d.alias("p50_value"),
        null_d.alias("p90_value"),
        null_d.alias("p99_value"),
        null_d.alias("max_value"),
    )
    pc = _events_value_percentiles_core(spark, sf_dir).select(
        F.lit("type_percentiles").alias("kind"),
        F.col("event_type").alias("group_key"),
        F.col("n_events").alias("n"),
        null_d.alias("avg_value"),
        "p50_value",
        "p90_value",
        "p99_value",
        "max_value",
    )
    hq = _events_hist_quantiles_core(spark, sf_dir).select(
        F.lit("type_hist_quantiles").alias("kind"),
        F.col("event_type").alias("group_key"),
        F.col("n_events").alias("n"),
        null_d.alias("avg_value"),
        "p50_value",
        "p90_value",
        "p99_value",
        "max_value",
    )
    # count-min point-frequency probes beside their exact twin — the
    # frequency sketch rides the same hash as the quantile sketch
    def _freq_arm(tag, fn):
        return fn(spark, sf_dir).select(
            F.lit(tag).alias("kind"),
            F.col("user_key").alias("group_key"),
            F.col("n_events").alias("n"),
            null_d.alias("avg_value"),
            null_d.alias("p50_value"),
            null_d.alias("p90_value"),
            null_d.alias("p99_value"),
            null_d.alias("max_value"),
        )

    cm = _freq_arm("user_cms_freq", _events_user_cms_freq_core)
    ce = _freq_arm("user_exact_freq", _events_user_exact_freq_core)
    return _suite_sorted(
        jp.unionByName(pc).unionByName(hq).unionByName(cm).unionByName(ce),
        ["kind", "group_key"],
        ["kind", "group_key"],
    )


def _events_profile_sql() -> str:
    from car_etl_spark.queries.eventsq import (
        EVENTS_JSON_PROPS_SQL,
        EVENTS_PERCENTILES_SQL,
        events_hist_quantiles_sql,
        events_user_cms_sql,
        events_user_exact_sql,
    )

    nulls = (
        "CAST(NULL AS DOUBLE) AS avg_value, CAST(NULL AS DOUBLE) AS p50_value, "
        "CAST(NULL AS DOUBLE) AS p90_value, CAST(NULL AS DOUBLE) AS p99_value, "
        "CAST(NULL AS DOUBLE) AS max_value"
    )
    return f"""
SELECT * FROM (
SELECT 'json_k_bucket' AS kind, CAST(k_bucket AS VARCHAR) AS group_key, n,
       avg_value, CAST(NULL AS DOUBLE) AS p50_value, CAST(NULL AS DOUBLE) AS p90_value,
       CAST(NULL AS DOUBLE) AS p99_value, CAST(NULL AS DOUBLE) AS max_value
FROM ({EVENTS_JSON_PROPS_SQL})
UNION ALL
SELECT 'type_percentiles' AS kind, event_type AS group_key, n_events AS n,
       CAST(NULL AS DOUBLE) AS avg_value, p50_value, p90_value, p99_value, max_value
FROM ({EVENTS_PERCENTILES_SQL})
UNION ALL
SELECT 'type_hist_quantiles' AS kind, event_type AS group_key, n_events AS n,
       CAST(NULL AS DOUBLE) AS avg_value, p50_value, p90_value, p99_value, max_value
FROM ({events_hist_quantiles_sql()})
UNION ALL
SELECT 'user_cms_freq' AS kind, user_key AS group_key, n_events AS n, {nulls}
FROM ({events_user_cms_sql()})
UNION ALL
SELECT 'user_exact_freq' AS kind, user_key AS group_key, n_events AS n, {nulls}
FROM ({events_user_exact_sql()})
) ORDER BY kind, group_key
"""


# ---------------------------------------------------------------------------
# OM validation: field-grain report + document-level confidence


def om_full_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F26-F29 + A11 in one slot: the per-orderkey validation report
    (consistency penalties, field confidence, pro-forma warnings,
    calibration variances) with each row carrying its document's
    weighted confidence + critical-field coverage (custkey-level,
    denormalized through the order -> customer key — the reference
    stores document confidence beside extraction fields the same
    way)."""
    from car_etl_spark.queries.confidenceq import om_validation_report
    from car_etl_spark.queries.misc import om_document_confidence
    from car_etl_spark.tables import load_tables

    report = om_validation_report(spark, sf_dir)
    doc = om_document_confidence(spark, sf_dir).select(
        "c_custkey",
        F.col("base_confidence").alias("doc_base_confidence"),
        F.col("critical_found").alias("doc_critical_found"),
        "document_confidence",
    )
    keys = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        F.col("o_orderkey").alias("orderkey"), "o_custkey"
    )
    # r13: the final sort's range sampler re-ran the orderkey-grain
    # merge stage (both join-input shuffles are reused, but the SMJ
    # sorts + merge re-execute); _suite_sorted materializes the joined
    # report once.  orderkey is the unique grain — total order.
    return _suite_sorted(
        report.join(keys, "orderkey")
        .join(doc, F.col("o_custkey") == F.col("c_custkey"))
        .drop("o_custkey", "c_custkey"),
        ["orderkey"],
        ["orderkey"],
    )


def _om_full_sql() -> str:
    from car_etl_spark.queries.confidenceq import OM_VALIDATION_REPORT_SQL
    from car_etl_spark.queries.misc import OM_DOCUMENT_CONFIDENCE_SQL

    return f"""
SELECT r.*, d.base_confidence AS doc_base_confidence,
       d.critical_found AS doc_critical_found, d.document_confidence
FROM ({OM_VALIDATION_REPORT_SQL}) r
JOIN orders o ON r.orderkey = o.o_orderkey
JOIN ({OM_DOCUMENT_CONFIDENCE_SQL}) d ON o.o_custkey = d.c_custkey
ORDER BY r.orderkey
"""


# ---------------------------------------------------------------------------
# Structural joins: parent-chain self-join + date-interval rollup


def structural_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 + J9 in one slot (r6 consolidation): the parent-reference
    self-join (each order vs its customer's first order) and the
    equi+date-range shipment rollup, kind-tagged on a harmonized
    (kind, orderkey, parent_orderkey, group_key, day_lag, n_rows,
    avg_lag_days) grain — sub-expressions unchanged from the r1
    fine-grained queries."""
    from car_etl_spark.queries.misc import (
        _hierarchy_self_join_core,
        _interval_join_shipments_core,
    )

    # r13: arms consumed UNSORTED through their cores (dead per-arm
    # sorts + range-sampler re-runs — the r12 §10d defect)
    null_l = F.lit(None).cast("long")
    hier = _hierarchy_self_join_core(spark, sf_dir).select(
        F.lit("parent_chain").alias("kind"),
        "orderkey",
        "parent_orderkey",
        F.col("custkey").cast("string").alias("group_key"),
        F.col("days_after_first").alias("day_lag"),
        null_l.alias("n_rows"),
        F.lit(None).cast("double").alias("avg_lag_days"),
    )
    ival = _interval_join_shipments_core(spark, sf_dir).select(
        F.lit("interval_rollup").alias("kind"),
        null_l.alias("orderkey"),
        null_l.alias("parent_orderkey"),
        F.col("o_orderpriority").alias("group_key"),
        null_l.alias("day_lag"),
        F.col("shipments_within_90d").cast("long").alias("n_rows"),
        "avg_lag_days",
    )
    return _suite_sorted(
        hier.unionByName(ival),
        ["kind", "group_key", "orderkey"],
        ["kind", "group_key", "orderkey"],
    )


def _structural_join_sql() -> str:
    from car_etl_spark.queries.misc import HIERARCHY_SELF_JOIN_SQL, INTERVAL_JOIN_SQL

    return f"""
SELECT * FROM (
SELECT 'parent_chain' AS kind, orderkey, parent_orderkey,
       CAST(custkey AS VARCHAR) AS group_key, days_after_first AS day_lag,
       CAST(NULL AS BIGINT) AS n_rows, CAST(NULL AS DOUBLE) AS avg_lag_days
FROM ({HIERARCHY_SELF_JOIN_SQL})
UNION ALL
SELECT 'interval_rollup' AS kind, CAST(NULL AS BIGINT) AS orderkey,
       CAST(NULL AS BIGINT) AS parent_orderkey, o_orderpriority AS group_key,
       CAST(NULL AS BIGINT) AS day_lag,
       CAST(shipments_within_90d AS BIGINT) AS n_rows, avg_lag_days
FROM ({INTERVAL_JOIN_SQL})
) ORDER BY kind, group_key, orderkey
"""


# ---------------------------------------------------------------------------
# Extraction pipeline: versions + field overrides (joined stages)


def extraction_pipeline_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/W3 + X10 as the composed pipeline the reference actually runs:
    versioned extractions (deterministic per-batch version, is_current)
    joined to their field-level override merge — field rows carry their
    extraction's version lineage."""
    from car_etl_spark.queries.eav import field_override_merge, versioned_extractions

    fields = field_override_merge(spark, sf_dir)
    versions = versioned_extractions(spark, sf_dir)
    # r13: the final sort sat directly on the two broadcast joins with
    # no shuffle anywhere below (the arms' own sorts are eliminated
    # under the join), so the range sampler re-ran the full fields scan
    # + both joins — _suite_sorted materializes the joined rows once.
    # (extraction_id, field_name) = (l_orderkey, l_linenumber), the
    # lineitem PK: total order, rows/order unchanged.
    return _suite_sorted(
        fields.join(versions, "extraction_id").select(
            "document_id", "extraction_id", "version", "is_current",
            "field_name", "field_value", "confidence", "is_override",
            "overridden_by",
        ),
        ["extraction_id", "field_name"],
        ["extraction_id", "field_name"],
    )


def _extraction_pipeline_sql() -> str:
    from car_etl_spark.queries.eav import FIELD_OVERRIDE_SQL, VERSIONED_EXTRACTIONS_SQL

    return f"""
SELECT v.document_id, f.extraction_id, v.version, v.is_current,
       f.field_name, f.field_value, f.confidence, f.is_override, f.overridden_by
FROM ({FIELD_OVERRIDE_SQL}) f
JOIN ({VERSIONED_EXTRACTIONS_SQL}) v ON f.extraction_id = v.extraction_id
ORDER BY f.extraction_id, f.field_name
"""


# ---------------------------------------------------------------------------
# Events: per-user pivot + session metrics, one user-grain report


def events_user_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/A12 pivot (type-conditional aggregation + retry/DLQ stats)
    key-joined to the W-family session rollup — both user_id-grain, so
    one wide report carries both hard signals (round-6 consolidation
    freeing a slot for training_mix_suite).

    r12 adds the TRAILING-WINDOW RATE-GATE arm at the same grain (the
    reference's email rate limiter, ``src/services/
    email_rate_limiter.py`` — trailing per-sender count, refuse at the
    limit): the ``rate_*`` columns ride this row's oracle hash, so the
    window arithmetic and the gate decision are engine-checked."""
    from car_etl_spark.queries.eventsq import (
        events_rate_limit_gate,
        events_sessionize,
        events_type_pivot,
    )

    pivot = events_type_pivot(spark, sf_dir)
    sess = events_sessionize(spark, sf_dir)
    gate = events_rate_limit_gate(spark, sf_dir)
    # r13 examined, left alone: a repartition("user_id") below the sort
    # is ELIMINATED by Catalyst (the pivot side's agg exchange already
    # hash-partitions on user_id — verified, plan unchanged), so the
    # sampling tax here is already bounded by the existing exchange
    return pivot.join(sess, "user_id").join(gate, "user_id").orderBy("user_id")


def _events_user_report_sql() -> str:
    from car_etl_spark.queries.eventsq import (
        EVENTS_RATE_LIMIT_SQL,
        EVENTS_SESSIONIZE_SQL,
        EVENTS_TYPE_PIVOT_SQL,
    )

    return f"""
SELECT p.*, s.session_count, s.max_session_events, s.total_value,
       r.rate_events, r.rate_throttled, r.rate_throttled_frac,
       r.rate_peak_window
FROM ({EVENTS_TYPE_PIVOT_SQL}) p
JOIN ({EVENTS_SESSIONIZE_SQL}) s USING (user_id)
JOIN ({EVENTS_RATE_LIMIT_SQL}) r USING (user_id)
ORDER BY user_id
"""


def fine_grained_queries() -> dict:
    """Old registry name -> constituent function, for surfaces that
    keep timing/pinning the fine-grained serving paths individually
    (bench.py, plan contracts).  ONE map so the next consolidation
    cannot drift between ad-hoc copies."""
    from car_etl_spark.queries import (
        dedup,
        eav,
        entity,
        eventsq,
        fts,
        misc,
        rag,
        search,
        textops,
        vector,
    )
    from car_etl_spark.queries.confidenceq import om_validation_report

    return {
        # r09 consolidation: entity_match_modes (registry) = these two
        "entity_match_blocked": entity.entity_match_blocked,
        "entity_match_lsh_extended": entity.entity_match_lsh_extended,
        # r11 consolidation: the registry row of the same name gained
        # the doc_dup_clusters closure (cc_* columns); the BENCH row
        # keeps the plain source-grain form so numbers stay comparable
        # (bench.py resolves fine-grained names FIRST for this reason)
        "doc_exact_dedup_stats": textops.doc_exact_dedup_stats_plain,
        "doc_dup_clusters": textops.doc_dup_clusters,
        # r12 consolidation: the registry row doc_corpus_profile gained
        # the span-dedup columns; the standalone report is the bench row
        "span_dedup_report": textops.span_dedup_report,
        "rag_context_budget": rag.rag_context_budget,
        "hierarchy_self_join": misc.hierarchy_self_join,
        "interval_join_shipments": misc.interval_join_shipments,
        "fts_posting_search": fts.fts_posting_search,
        "fts_posting_scan": fts.fts_posting_scan,
        "fts_porter_search": fts.fts_porter_search,
        "fts_plainto_search": fts.fts_plainto_search,
        "fts_batch_search": fts.fts_batch_search,
        "fts_bm25_search": fts.fts_bm25_search,
        "fts_phrase_search": fts.fts_phrase_search,
        "vector_topk": vector.vector_topk,
        "vector_ivf_topk": vector.vector_ivf_topk,
        "vector_filtered_topk": vector.vector_filtered_topk,
        "vector_tenant_filtered_topk": vector.vector_tenant_filtered_topk,
        "vector_pq_topk": vector.vector_pq_topk,
        "vector_topk_adaptive": vector.vector_topk_adaptive,
        "vector_topk_batch": vector.vector_topk_batch,
        "vector_ivf_topk_batch": vector.vector_ivf_topk_batch,
        "vector_label_profile": vector.vector_label_profile,
        "vector_knn_label_vote": vector.vector_knn_label_vote,
        "doc_quality_scores": textops.doc_quality_scores,
        "doc_repetition_profile": textops.doc_repetition_profile,
        "doc_keyword_search": textops.doc_keyword_search,
        "doc_substring_search": textops.doc_substring_search,
        "doc_regex_search": textops.doc_regex_search,
        "doc_keyword_scan": textops.doc_keyword_scan,
        "doc_search_highlight": textops.doc_search_highlight,
        "hybrid_rrf_search": search.hybrid_rrf_search,
        "hybrid_porter_ivf_search": search.hybrid_porter_ivf_search,
        "minhash_lsh_neardup": dedup.minhash_lsh_neardup,
        "simhash_neardup": dedup.simhash_neardup,
        "embedding_neardup_lsh": dedup.embedding_neardup_lsh,
        "token_jaccard_blocked": dedup.token_jaccard_blocked,
        "embedding_neardup_exact_block": dedup.embedding_neardup_exact_block,
        "events_time_windows": eventsq.events_time_windows,
        "events_rollup_served": events_rollup_served,
        "events_type_pivot": eventsq.events_type_pivot,
        "events_sessionize": eventsq.events_sessionize,
        "events_multires_rollup": eventsq.events_multires_rollup,
        "events_json_props": eventsq.events_json_props,
        "events_value_percentiles": eventsq.events_value_percentiles,
        # r12: the registry row events_user_report gained the rate-gate
        # arm (reference email rate limiter); fine-grained form here
        "events_rate_limit_gate": eventsq.events_rate_limit_gate,
        "om_validation_report": om_validation_report,
        "om_document_confidence": misc.om_document_confidence,
        "versioned_extractions": eav.versioned_extractions,
        "field_override_merge": eav.field_override_merge,
        "email_address_extract": misc.email_address_extract,
    }


#: the SERVING-path queries: resident-store reads a long-running search
#: service answers per request (fixed-plan, prepared-statement shaped).
#: ONE list so the warm-boot hook (api.prepare_serving), the service
#: bench, and the cold-boot measurement cannot drift on what "serving"
#: means.
SERVING_MODE_NAMES = (
    "doc_keyword_search",
    "doc_substring_search",
    "doc_regex_search",
    "fts_posting_search",
    "fts_porter_search",
    "fts_plainto_search",
    "fts_bm25_search",
    "fts_phrase_search",
    "vector_topk",
    "vector_ivf_topk",
    "vector_filtered_topk",
    "vector_tenant_filtered_topk",
    "vector_pq_topk",
    "hybrid_rrf_search",
    "hybrid_porter_ivf_search",
    "hybrid_rerank_page",
    "events_rollup_served",
    "rag_context_modes",
)


def serving_modes() -> dict:
    """Name -> fn(spark, sf_dir) for :data:`SERVING_MODE_NAMES`."""
    from car_etl_spark.queries import rag, search

    fg = fine_grained_queries()
    extra = {
        "hybrid_rerank_page": search.hybrid_rerank_page,
        "rag_context_modes": rag.rag_context_modes,
    }
    return {
        n: (fg[n] if n in fg else extra[n]) for n in SERVING_MODE_NAMES
    }


def build_suite_queries() -> dict[str, QuerySpec]:
    return {
        "vector_topk_modes": QuerySpec(
            vector_topk_modes, _vector_modes_sql(), ("vector", "topk", "suite")
        ),
        "vector_label_report": QuerySpec(
            vector_label_report, _vector_label_report_sql(), ("vector",)
        ),
        "doc_quality_repetition": QuerySpec(
            doc_quality_repetition, _doc_quality_repetition_sql(), ("text", "quality")
        ),
        "doc_keyword_modes": QuerySpec(
            doc_keyword_modes, _doc_keyword_modes_sql(), ("search", "suite")
        ),
        "hybrid_search_modes": QuerySpec(
            hybrid_search_modes, _hybrid_modes_sql(), ("search", "rrf", "suite")
        ),
        "lsh_neardup_suite": QuerySpec(
            lsh_neardup_suite, _lsh_neardup_suite_sql, ("dedup", "lsh", "portable")
        ),
        "exact_neardup_companions": QuerySpec(
            exact_neardup_companions, _exact_companions_sql, ("dedup",)
        ),
        "events_window_rollups": QuerySpec(
            events_window_rollups, _events_window_rollups_sql(), ("events", "window")
        ),
        "events_profile": QuerySpec(
            events_profile, _events_profile_sql(), ("events", "quantiles", "json")
        ),
        "om_full_validation_report": QuerySpec(
            om_full_validation_report, _om_full_sql(), ("confidence",)
        ),
        "extraction_pipeline_versions": QuerySpec(
            extraction_pipeline_versions, _extraction_pipeline_sql(),
            ("versioning", "merge"),
        ),
        "fts_search_suite": QuerySpec(
            fts_search_suite, _fts_suite_sql(), ("search", "fts", "suite")
        ),
        "structural_join_suite": QuerySpec(
            structural_join_suite, _structural_join_sql(), ("join", "suite")
        ),
        "events_user_report": QuerySpec(
            events_user_report, _events_user_report_sql(), ("events", "suite")
        ),
    }
