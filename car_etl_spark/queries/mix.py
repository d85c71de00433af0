"""Training-data mix operators: deterministic stratified sampling and
benchmark-contamination screening, reported at source grain.

A 100 TB pretraining pipeline needs two controls the reference's
ingest side assumes upstream (beyond-survey, north-star scope):

- **Mixing weights** — each source contributes at a configured rate.
  Sampling must be DETERMINISTIC (a re-run keeps the identical subset:
  reproducible ablations, resumable jobs), so the accept/reject test is
  a pure function of the row key — a Knuth multiplicative hash in exact
  BIGINT arithmetic, identical in Spark and DuckDB, never ``rand()``.
  Map-only at any scale: no shuffle, no state.
- **Contamination screen** — documents sharing an 8-word shingle with
  an evaluation/benchmark set must be flagged (train/test leakage).
  Shingles are explode+aggregate (never per-row HOF arrays); the
  benchmark side is bounded (benchmark suites are small by nature), so
  the gram join broadcasts it and the corpus side streams map-side.
  At 100 TB: corpus grams are generated and probed in one pass; only
  matching doc_ids reach the (tiny) distinct/aggregate.

Both controls land in ONE source-grain report (the key-joined metric
set pattern), giving the suite a single oracle-checked driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_etl_spark.queries import QuerySpec
from car_etl_spark.tables import load_tables

#: Knuth multiplicative hash constants.  The key is reduced mod 2^31
#: BEFORE the multiply so the product stays under 2^63 (exact in BIGINT
#: on both engines — no overflow, no float).
HASH_MULT = 2654435761
HASH_MOD = 4294967296  # 2^32
KEY_MOD = 2147483648  # 2^31

#: benchmark membership: every 29th doc_id plays the held-out set.  In
#: production this is a join against the real benchmark corpus; the
#: modulus keeps the synthetic twin SQL-recomputable.
BENCHMARK_MOD = 29

NGRAM = 8


def sample_hash(key) -> F.Column:
    """Deterministic uniform u in [0, 2^32) from an integer key —
    the accept test is ``u < rate * 2^32``."""
    return (key % F.lit(KEY_MOD)) * F.lit(HASH_MULT) % F.lit(HASH_MOD)


def source_rate() -> F.Column:
    """The configured mixing weight per source — a deterministic CASE
    over the source index so the oracle shares the exact table.  (In
    production this is a broadcast config map; the rates here are exact
    binary fractions so rate*2^32 is exact on both engines.)"""
    idx = F.substring(F.col("source"), 4, 10).cast("int") % 4
    return (
        F.when(idx == 0, F.lit(1.0))
        .when(idx == 1, F.lit(0.5))
        .when(idx == 2, F.lit(0.25))
        .otherwise(F.lit(0.125))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict,
    key_col: str = "doc_id",
    source_col: str = "source",
    tenant_col: str | None = None,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling with CONFIGURED rates — the
    production form of the suite's CASE table: ``rates`` maps
    ``source -> rate`` (tenant-blind) or ``(tenant, source) -> rate``
    when ``tenant_col`` is given — per-tenant mix rates, the multi-
    tenant pipeline's contract (one tenant tuning its mix cannot touch
    another's subset).

    Isolation is structural, not just configured: with ``tenant_col``
    the accept hash covers (tenant, key), so tenant A's decisions are a
    pure function of A's own rows and rates — adding, removing, or
    re-rating tenant B changes nothing for A (pinned in
    tests/test_mix.py).  Map-only at any scale: the rate lookup is a
    literal CASE chain (config is control-plane grain), no shuffle, no
    state.  Unknown strata sample at ``default_rate`` (0.0 = fail
    closed)."""
    if tenant_col:
        pairs = [
            ((F.col(tenant_col).cast("string") == str(t)) & (F.col(source_col) == s), r)
            for (t, s), r in rates.items()
        ]
        # hash (tenant, key): exact-integer mix of the tenant hash into
        # the key BEFORE the Knuth multiply, still overflow-free.
        # pmod (not %) throughout: Spark's % preserves sign, and a
        # negative u would pass `u < cut` even at rate 0.0 — breaking
        # the fail-closed default for negative keys
        key = F.pmod(
            F.col(key_col) + F.pmod(F.xxhash64(F.col(tenant_col).cast("string")), F.lit(KEY_MOD)),
            F.lit(KEY_MOD),
        )
    else:
        pairs = [(F.col(source_col) == s, r) for s, r in rates.items()]
        key = F.pmod(F.col(key_col), F.lit(KEY_MOD))
    rate = F.lit(float(default_rate))
    for cond, r in reversed(pairs):
        rate = F.when(cond, F.lit(float(r))).otherwise(rate)
    u = F.pmod(key * F.lit(HASH_MULT), F.lit(HASH_MOD))
    cut = (rate * HASH_MOD).cast("long")
    return df.filter(u < cut)


def contamination_screen(
    corpus: DataFrame,
    benchmark: DataFrame,
    tenant_col: str | None = None,
    tenant=None,
) -> DataFrame:
    """Flag corpus documents sharing any 8-word shingle with the
    benchmark set — distinct (doc_id[, tenant], source) rows.

    The benchmark side is bounded (suites are small by nature) so its
    distinct grams BROADCAST; the corpus side streams map-side in one
    pass.  TENANT scope: a tenant-partitioned corpus must be screened
    per tenant (``tenant=``) — the filter lands before the gram
    explode, so on a landed table it prunes to the tenant's directories
    and the screen never reads another tenant's bytes (benchmarks are
    public reference data, shared across tenants by design)."""
    if tenant_col and tenant is None:
        raise ValueError(
            "tenant-partitioned corpus: screening requires tenant=...; "
            "cross-tenant audits iterate tenants explicitly"
        )
    keep = ["doc_id"] + ([tenant_col] if tenant_col else []) + ["source"]
    if tenant_col:
        corpus = corpus.filter(F.col(tenant_col) == tenant)
    bench_grams = _doc_grams(benchmark, keep=["doc_id"]).select("gram").distinct()
    grams = _doc_grams(corpus.select(*keep, "text"), keep=keep)
    return grams.join(F.broadcast(bench_grams), "gram").select(*keep).distinct()


def _doc_grams(docs: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """(doc_id, source, gram) for every word 8-gram (``keep`` overrides
    the carried id columns).  Tokenization is the cross-engine formula:
    lower, collapse whitespace, split on a single space; docs shorter
    than 8 tokens produce no grams."""
    keep = keep if keep is not None else ["doc_id", "source"]
    words = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    staged = docs.select(*keep, words.alias("w")).filter(F.size("w") >= NGRAM)
    return staged.select(
        *keep,
        F.explode(F.sequence(F.lit(1), F.size("w") - (NGRAM - 1))).alias("i"),
        "w",
    ).select(
        *keep,
        F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), NGRAM)).alias("gram"),
    )


def training_mix_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-grain mix report: documents per source, deterministic
    stratified-sample membership at the configured rate, benchmark-set
    size, and contamination count (non-benchmark docs sharing any
    8-gram with a benchmark doc)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    grams = _doc_grams(docs)
    bench_grams = (
        grams.filter(F.col("doc_id") % BENCHMARK_MOD == 0).select("gram").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % BENCHMARK_MOD != 0)
        .join(F.broadcast(bench_grams), "gram")
        .select("doc_id", "source")
        .distinct()
    )
    cont_by_src = contaminated.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_contaminated")
    )
    u = sample_hash(F.col("doc_id"))
    rate = source_rate()
    base = (
        docs.select(
            "doc_id",
            "source",
            u.alias("u"),
            rate.alias("rate"),
            (rate * HASH_MOD).cast("long").alias("cut"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("u") < F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_sampled"),
            F.round(F.max("rate"), 4).alias("sample_rate"),
            F.sum(F.when(F.col("doc_id") % BENCHMARK_MOD == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_benchmark"),
        )
    )
    return (
        base.join(cont_by_src, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_sampled",
            "sample_rate",
            "n_benchmark",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
        )
        .orderBy("source")
    )


TRAINING_MIX_SUITE_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS w
  FROM documents
), grams AS MATERIALIZED (
  SELECT doc_id, source, array_to_string(w[i:i+{NGRAM - 1}], ' ') AS gram
  FROM (
    SELECT doc_id, source, w,
           unnest(generate_series(1, len(w) - {NGRAM - 1})) AS i
    FROM toks WHERE len(w) >= {NGRAM}
  )
), bench AS MATERIALIZED (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {BENCHMARK_MOD} = 0
), contaminated AS MATERIALIZED (
  SELECT DISTINCT g.doc_id, g.source
  FROM grams g JOIN bench b USING (gram)
  WHERE g.doc_id % {BENCHMARK_MOD} <> 0
), cont_by_src AS MATERIALIZED (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_contaminated
  FROM contaminated GROUP BY source
), base AS MATERIALIZED (
  -- cut = rate * 2^32, written as exact integers (rates are binary
  -- fractions) so no engine ever touches decimal/double rounding
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN ((doc_id % {KEY_MOD}) * {HASH_MULT}) % {HASH_MOD} < cut
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         ROUND(MAX(rate), 4) AS sample_rate,
         CAST(SUM(CASE WHEN doc_id % {BENCHMARK_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_benchmark
  FROM (
    SELECT doc_id, source,
           CASE CAST(SUBSTR(source, 4) AS INT) % 4
                WHEN 0 THEN CAST(1.0 AS DOUBLE) WHEN 1 THEN CAST(0.5 AS DOUBLE)
                WHEN 2 THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.125 AS DOUBLE)
                END AS rate,
           CASE CAST(SUBSTR(source, 4) AS INT) % 4
                WHEN 0 THEN 4294967296 WHEN 1 THEN 2147483648
                WHEN 2 THEN 1073741824 ELSE 536870912 END AS cut
    FROM documents
  ) GROUP BY source
)
SELECT b.source, b.n_docs, b.n_sampled, b.sample_rate, b.n_benchmark,
       CAST(COALESCE(c.n_contaminated, 0) AS BIGINT) AS n_contaminated
FROM base b LEFT JOIN cont_by_src c USING (source)
ORDER BY b.source
"""


#: sequence-packing parameters: chunk windows of 64 tokens (overlap 0 —
#: packing wants disjoint text), 256-token training rows.  Chunk max
#: <= budget is the next-fit precondition.  The shard count is
#: SCALE-DERIVED (r12): :func:`pack_shard_count` resolves it from the
#: corpus footer, with a 4-shard floor that preserves every
#: correctness/bench-scale layout.
PACK_CHUNK_TOKENS = 64
PACK_BUDGET = 256


def pack_shard_count(sf_dir: str) -> int:
    """Scale-derived export-shard count for the packing pipeline —
    parquet footer stat only, so the Spark side and the DuckDB twin
    derive the SAME number and ``training_pack`` stays a full oracle
    row (the ``jaccard_block_count`` discipline; unknown volume reads
    LARGE via on-disk bytes, never small)."""
    import os

    from car_etl_spark.operators.export import derive_num_shards
    from car_etl_spark.operators.indexing import (
        AVG_TOKEN_BYTES,
        _source_bytes,
        estimate_posting_rows,
    )

    path = os.path.join(sf_dir, "documents.parquet")
    est_tokens = estimate_posting_rows(path)
    if est_tokens < 0:
        est_tokens = max(1, _source_bytes(path) // AVG_TOKEN_BYTES)
    return derive_num_shards(est_tokens)


def training_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for the training exporter (segment grain, both
    disciplines arm-tagged — ``operators/packing.py``):

    - ``cut``: concat-and-cut at exact 256-token boundaries; chunks may
      span packs, each crossing emits one segment per pack with
      document-boundary flags (zero padding waste, the pretraining
      shape).  Pure running-sum + bounded explode.
    - ``nextfit``: greedy whole-chunk packing (no chunk ever splits —
      the instruction-tuning shape); sequential per shard, so it runs
      as one Arrow-batched ``applyInPandas`` pass per shard.

    Both assignments are pure integer arithmetic over deterministic
    (shard, order) keys, so the DuckDB twin replays ``cut`` with the
    same window running sum and ``nextfit`` with a recursive CTE —
    pack ids, offsets, and boundary flags exact to the hash."""
    from car_etl_spark.operators import packing as P
    from car_etl_spark.operators.chunking import chunk_by_tokens
    from car_etl_spark.operators.export import order_col, shard_col

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    chunks = chunk_by_tokens(
        docs, max_tokens=PACK_CHUNK_TOKENS, overlap=0, keep=("doc_id",)
    ).select(
        shard_col(F.col("doc_id"), pack_shard_count(sf_dir)).alias("shard"),
        order_col(F.col("doc_id")).alias("ord"),
        "doc_id",
        "chunk_index",
        F.col("token_count").cast("long").alias("token_count"),
    )
    order = ("ord", "doc_id", "chunk_index")
    cut = P.pack_cut(chunks, PACK_BUDGET, order_cols=order).withColumn(
        "arm", F.lit("cut")
    )
    nf = (
        P.pack_nextfit(chunks, PACK_BUDGET, order_cols=order)
        .select(
            "shard",
            "pack_id",
            "doc_id",
            "chunk_index",
            "pos_in_pack",
            F.col("token_count").alias("seg_tokens"),
            F.lit(1).alias("starts_item"),
            F.lit(1).alias("ends_item"),
        )
        .withColumn("arm", F.lit("nextfit"))
    )
    cols = [
        "arm", "shard", "pack_id", "doc_id", "chunk_index",
        "pos_in_pack", "seg_tokens", "starts_item", "ends_item",
    ]
    return (
        cut.select(*cols)
        .unionByName(nf.select(*cols))
        .orderBy(*cols)
    )


_TRAINING_PACK_SQL_T = """
WITH RECURSIVE toked AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' ') AS toks
  FROM documents WHERE trim(text) <> ''
), chunks AS (
  SELECT doc_id, start // {PACK_CHUNK_TOKENS} AS chunk_index,
         LEAST({PACK_CHUNK_TOKENS}, n - start) AS tc
  FROM (
    SELECT doc_id, len(toks) AS n,
           unnest(generate_series(0, greatest(len(toks) - 1, 0), {PACK_CHUNK_TOKENS})) AS start
    FROM toked
  )
), keyed AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {PACK_SHARDS} AS INT) AS shard,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|order'), 1, 15))::BIGINT AS ord,
         doc_id, chunk_index, tc
  FROM chunks
), offs AS (
  -- DuckDB SUM(BIGINT) widens to HUGEINT; pin BIGINT for // and =
  SELECT *, CAST(COALESCE(SUM(tc) OVER (
           PARTITION BY shard ORDER BY ord, doc_id, chunk_index
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM keyed WHERE tc > 0
), cut AS (
  SELECT shard, doc_id, chunk_index, off, tc,
         unnest(generate_series(off // {PACK_BUDGET}, (off + tc - 1) // {PACK_BUDGET})) AS pack_id
  FROM offs
), cut_rows AS (
  SELECT 'cut' AS arm, shard, pack_id, doc_id, chunk_index,
         GREATEST(off, pack_id * {PACK_BUDGET}) - pack_id * {PACK_BUDGET} AS pos_in_pack,
         LEAST(off + tc, (pack_id + 1) * {PACK_BUDGET})
           - GREATEST(off, pack_id * {PACK_BUDGET}) AS seg_tokens,
         CAST(GREATEST(off, pack_id * {PACK_BUDGET}) = off AS INT) AS starts_item,
         CAST(LEAST(off + tc, (pack_id + 1) * {PACK_BUDGET}) = off + tc AS INT) AS ends_item
  FROM cut
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id, chunk_index) AS rn
  FROM keyed
), rec AS (
  -- the greedy next-fit fold replayed exactly: running fill with
  -- reset-on-overflow, one recursion step per item within each shard
  SELECT shard, rn, doc_id, chunk_index, tc,
         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pos_in_pack, tc AS fill
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT i.shard, i.rn, i.doc_id, i.chunk_index, i.tc,
         CASE WHEN r.fill + i.tc > {PACK_BUDGET} AND r.fill > 0
              THEN r.pack_id + 1 ELSE r.pack_id END,
         CASE WHEN r.fill + i.tc > {PACK_BUDGET} AND r.fill > 0
              THEN CAST(0 AS BIGINT) ELSE r.fill END,
         CASE WHEN r.fill + i.tc > {PACK_BUDGET} AND r.fill > 0
              THEN i.tc ELSE r.fill + i.tc END
  FROM rec r JOIN ranked i ON i.shard = r.shard AND i.rn = r.rn + 1
), nf_rows AS (
  SELECT 'nextfit' AS arm, shard, pack_id, doc_id, chunk_index,
         pos_in_pack, tc AS seg_tokens, 1 AS starts_item, 1 AS ends_item
  FROM rec
)
SELECT * FROM cut_rows
UNION ALL
SELECT * FROM nf_rows
ORDER BY arm, shard, pack_id, doc_id, chunk_index, pos_in_pack
"""


def training_pack_sql(sf_dir: str) -> str:
    """Oracle builder: the shard count comes from the SAME
    :func:`pack_shard_count` call as the Spark side (both read the
    parquet footer, so they cannot desync)."""
    return _TRAINING_PACK_SQL_T.format(
        PACK_CHUNK_TOKENS=PACK_CHUNK_TOKENS,
        PACK_BUDGET=PACK_BUDGET,
        PACK_SHARDS=pack_shard_count(sf_dir),
    )


QUERIES: dict[str, QuerySpec] = {
    "training_mix_suite": QuerySpec(
        training_mix_suite, TRAINING_MIX_SUITE_SQL, ("mix", "sampling", "contamination")
    ),
    "training_pack": QuerySpec(
        training_pack, training_pack_sql, ("mix", "packing", "export")
    ),
}
