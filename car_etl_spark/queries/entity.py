"""Entity-resolution queries: canonicalization, blocked similarity join,
merge repointing (SURVEY.md §2.3 J4/J5, §2.8 F10-F13).

The reference compares entity pairs in Python with difflib
(``src/entities/matching.py:67-110``); at scale that is a blocked
similarity self-join: block on a cheap key (here segment + canonical-
name prefix; in the real schema ``(tenant_id, entity_type)`` + the same
prefix), generate pairs inside blocks only, score with JVM-side
expressions, classify with the 0.80/0.95 thresholds
(``matching.py:104-110``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_etl_spark.functions import normalizers as N
from car_etl_spark.queries import QuerySpec
from car_etl_spark.tables import load_tables


def entity_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 over synthesized corporate names: suffix/punctuation variants
    collapse to one canonical form (reference
    ``src/entities/canonicalize.py:11-18``)."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    suffixes = ["", " LLC", " Inc.", " CORP", " ltd", ", LP"]
    name = F.concat(
        F.col("c_name"),
        F.element_at(F.array(*[F.lit(s) for s in suffixes]), (F.col("c_custkey") % 6 + 1).cast("int")),
    )
    return (
        cust.select(
            "c_custkey",
            name.alias("raw_name"),
            N.canonicalize(name).alias("canonical_name"),
            N.normalize_text(name).alias("match_text"),
        )
        .orderBy("c_custkey")
    )


ENTITY_CANONICALIZE_SQL = """
WITH src AS (
  SELECT c_custkey,
         c_name || (['',' LLC',' Inc.',' CORP',' ltd',', LP'])[CAST(c_custkey % 6 AS INT) + 1]
           AS raw_name
  FROM customer
), canon AS (
  SELECT c_custkey, raw_name,
         TRIM(regexp_replace(
           regexp_replace(
             TRIM(regexp_replace(regexp_replace(LOWER(raw_name), '[^a-z0-9 \t]', '', 'g'),
                                 '\\s+', ' ', 'g')),
             '\\b(llc|inc|corp|ltd|lp)\\b', '', 'g'),
           '\\s+', ' ', 'g')) AS canonical_name,
         TRIM(regexp_replace(regexp_replace(LOWER(raw_name), '[^a-z0-9]+', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS match_text
  FROM src
)
SELECT c_custkey, raw_name, canonical_name, match_text FROM canon
ORDER BY c_custkey
"""


def entity_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/F12/F13: blocked similarity self-join with decision buckets.

    DUAL blocking keys, unioned: (mktsegment, all-but-last-2 name
    prefix) and (mktsegment, FIXED last-6-chars tail).  A
    variable-length affix key only ever pairs SAME-LENGTH names (string
    equality between a 7- and an 8-char prefix is impossible), so the
    prefix key alone never compared indel-similar names; the
    fixed-length tail CAN match across different lengths, covering
    head-edits and insertions/deletions anywhere before the last 6
    characters.  Candidates are the deduped union of both equi-joins
    (each hash-joinable — an OR'd join predicate would degrade to a
    per-segment nested loop).

    Block-size scaling: prefix blocks are bounded by the names sharing
    an all-but-2-chars prefix at any corpus size; tail blocks hold
    ~|corpus| / alphabet^6 names, so the tail WIDTH is the knob that
    must grow with the corpus (6 chars bounds blocks to ~10^3 at 10^9
    entities over a digit-heavy alphabet).  Edits inside BOTH affixes
    escape exact blocking by design — the MinHash/LSH operators
    (operators/similarity) are the recall extension for that.
    Aggregated to per-(segment, decision) counts."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    norm = N.normalize_text(F.col("c_name"))
    canon = cust.select(
        "c_custkey",
        "c_mktsegment",
        norm.alias("norm_name"),
        # Precompute lengths: keeps the fused per-pair loop lean (string
        # length() per pair measured 4x slower end-to-end).
        F.length(norm).alias("nlen"),
        F.substring(norm, 1, F.greatest(F.length(norm) - 2, F.lit(1))).alias("name_prefix"),
        # right(norm, 6) spelled as substring so Spark and DuckDB share
        # one formula (shorter names keep their whole string)
        F.substring(norm, F.greatest(F.length(norm) - 5, F.lit(1)), F.lit(6)).alias(
            "name_suffix"
        ),
        F.round("c_acctbal", 0).alias("bal_bucket"),
    )
    # Pair generation is quadratic per block; the shuffle join on the
    # block key spreads blocks across the cluster.
    a = canon.alias("a")
    b = canon.alias("b")

    def block_pairs(key: str):
        return a.join(
            b,
            (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        ).select(
            F.col("a.c_custkey").alias("ka"),
            F.col("b.c_custkey").alias("kb"),
            F.col("a.c_mktsegment").alias("segment"),
            F.col("a.norm_name").alias("na"),
            F.col("b.norm_name").alias("nb"),
            F.col("a.nlen").alias("la"),
            F.col("b.nlen").alias("lb"),
            F.col("a.bal_bucket").alias("ba"),
            F.col("b.bal_bucket").alias("bb"),
        )

    pairs = (
        block_pairs("name_prefix")
        .unionByName(block_pairs("name_suffix"))
        .dropDuplicates(["ka", "kb"])  # a pair may match both keys
    )
    la, lb = F.col("la"), F.col("lb")
    name_sim = (
        F.when((la == 0) & (lb == 0), F.lit(1.0))
        .when((la == 0) | (lb == 0), F.lit(0.0))
        .otherwise(1.0 - F.levenshtein(F.col("na"), F.col("nb")) / F.greatest(la, lb))
    )
    bal_sim = F.when(F.col("ba") == F.col("bb"), 1.0).otherwise(0.0)
    weighted = F.round((0.5 * name_sim + 0.3 * bal_sim) / 0.8, 6)
    return (
        pairs.select(
            F.col("segment"),
            N.match_decision(weighted).alias("decision"),
            weighted.alias("weighted_score"),
        )
        .groupBy("segment", "decision")
        .agg(
            F.count(F.lit(1)).alias("pair_count"),
            F.round(F.avg("weighted_score"), 6).alias("avg_score"),
        )
        .orderBy("segment", "decision")
    )


ENTITY_MATCH_BLOCKED_SQL = """
WITH canon AS (
  SELECT c_custkey, c_mktsegment,
         TRIM(regexp_replace(regexp_replace(LOWER(c_name), '[^a-z0-9]+', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS norm_name,
         ROUND(c_acctbal, 0) AS bal_bucket
  FROM customer
), keyed AS (
  SELECT *,
         SUBSTRING(norm_name, 1, GREATEST(LENGTH(norm_name) - 2, 1)) AS name_prefix,
         SUBSTRING(norm_name, GREATEST(LENGTH(norm_name) - 5, 1), 6) AS name_suffix
  FROM canon
), cand AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb, a.c_mktsegment AS segment,
         a.norm_name AS na, b.norm_name AS nb,
         a.bal_bucket AS ba, b.bal_bucket AS bb
  FROM keyed a JOIN keyed b
    ON a.c_mktsegment = b.c_mktsegment
   AND a.name_prefix = b.name_prefix
   AND a.c_custkey < b.c_custkey
  UNION
  SELECT a.c_custkey, b.c_custkey, a.c_mktsegment,
         a.norm_name, b.norm_name,
         a.bal_bucket, b.bal_bucket
  FROM keyed a JOIN keyed b
    ON a.c_mktsegment = b.c_mktsegment
   AND a.name_suffix = b.name_suffix
   AND a.c_custkey < b.c_custkey
), pairs AS (
  SELECT segment,
         CASE WHEN LENGTH(na) = 0 AND LENGTH(nb) = 0 THEN 1.0
              WHEN LENGTH(na) = 0 OR LENGTH(nb) = 0 THEN 0.0
              ELSE 1.0 - CAST(levenshtein(na, nb) AS DOUBLE)
                         / GREATEST(LENGTH(na), LENGTH(nb)) END AS name_sim,
         CASE WHEN ba = bb THEN 1.0 ELSE 0.0 END AS bal_sim
  FROM cand
), scored AS (
  SELECT segment,
         ROUND((0.5 * name_sim + 0.3 * bal_sim) / 0.8, 6) AS weighted_score
  FROM pairs
)
SELECT segment,
       CASE WHEN weighted_score >= 0.95 THEN 'auto_merge'
            WHEN weighted_score >= 0.80 THEN 'suggest_merge'
            ELSE 'different' END AS decision,
       COUNT(*) AS pair_count,
       ROUND(AVG(weighted_score), 6) AS avg_score
FROM scored
GROUP BY 1, 2
ORDER BY segment, decision
"""


def entity_merge_repoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: merge repointing — references held by merged duplicates are
    rewritten to the canonical entity, then recounted (reference
    ``src/entities/resolution.py:218-234``).

    Duplicate rule here: customers sharing (nationkey, mktsegment,
    round(acctbal, -2)) form a duplicate group; canonical = lowest key
    (the reference keeps the most-referenced entity — same dataflow)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    groups = t["customer"].select(
        "c_custkey",
        F.concat_ws(
            "|",
            F.col("c_nationkey").cast("string"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / 100).cast("string"),
        ).alias("dup_key"),
    )
    canonical = groups.groupBy("dup_key").agg(F.min("c_custkey").alias("canonical_key"))
    mapping = groups.join(F.broadcast(canonical), "dup_key").select("c_custkey", "canonical_key")
    return (
        t["orders"]
        .join(mapping, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("canonical_key")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.countDistinct("o_custkey").alias("merged_members"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("canonical_key")
    )


ENTITY_MERGE_REPOINT_SQL = """
WITH groups AS (
  SELECT c_custkey,
         CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|' ||
           CAST(CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS VARCHAR) AS dup_key
  FROM customer
), canonical AS (
  SELECT dup_key, MIN(c_custkey) AS canonical_key FROM groups GROUP BY dup_key
), mapping AS (
  SELECT g.c_custkey, c.canonical_key FROM groups g JOIN canonical c USING (dup_key)
)
SELECT canonical_key,
       COUNT(*) AS order_count,
       COUNT(DISTINCT o_custkey) AS merged_members,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN mapping ON o_custkey = c_custkey
GROUP BY canonical_key
ORDER BY canonical_key
"""


QUERIES: dict[str, QuerySpec] = {
    "entity_canonicalize": QuerySpec(entity_canonicalize, ENTITY_CANONICALIZE_SQL, ("entity",)),
    "entity_match_blocked": QuerySpec(entity_match_blocked, ENTITY_MATCH_BLOCKED_SQL, ("entity", "similarity-join")),
    "entity_merge_repoint": QuerySpec(entity_merge_repoint, ENTITY_MERGE_REPOINT_SQL, ("entity", "merge")),
}
