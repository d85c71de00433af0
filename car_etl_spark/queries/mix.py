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


def _doc_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, source, gram) for every word 8-gram.  Tokenization is
    the cross-engine formula: lower, collapse whitespace, split on a
    single space; docs shorter than 8 tokens produce no grams."""
    words = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    staged = docs.select("doc_id", "source", words.alias("w")).filter(
        F.size("w") >= NGRAM
    )
    return staged.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.size("w") - (NGRAM - 1))).alias("i"),
        "w",
    ).select(
        "doc_id",
        "source",
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
