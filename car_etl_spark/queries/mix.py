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


QUERIES: dict[str, QuerySpec] = {
    "training_mix_suite": QuerySpec(
        training_mix_suite, TRAINING_MIX_SUITE_SQL, ("mix", "sampling", "contamination")
    ),
}
