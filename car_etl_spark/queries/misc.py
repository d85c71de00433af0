"""Remaining operator-inventory queries: email parsing (F32), hierarchy
self-join (J8), date-interval join (J9), document-level confidence with
critical-field coverage (A11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_etl_spark.queries import QuerySpec
from car_etl_spark.queries.parity import rnd
from car_etl_spark.tables import load_tables

EMAIL_RE = r"<([^<>@\s]+@[^<>@\s]+)>"


def email_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F32 extraction frame: ``"Name <a@b>" -> a@b`` per customer
    (reference ``src/services/email_parser.py:87-115``).  Registered
    through ``normalize_roundtrips`` (kind='email') since round 5 —
    the extraction IS a normalizer roundtrip; the old domain rollup
    remains below for API parity."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    k = F.col("c_custkey")
    domain_pool = ["acme.com", "example.org", "mail.net"]
    domain = F.element_at(F.array(*[F.lit(d) for d in domain_pool]), (k % 3 + 1).cast("int"))
    header = F.concat(
        F.col("c_name"), F.lit(" <user"), k.cast("string"), F.lit("@"), domain, F.lit(">")
    )
    extracted = F.regexp_extract(header, EMAIL_RE, 1)
    return cust.select(
        "c_custkey",
        header.alias("from_header"),
        extracted.alias("from_address"),
        F.split(extracted, "@").getItem(1).alias("domain"),
    )


EMAIL_PARSED_SQL = """
SELECT c_custkey,
       c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@' ||
         (['acme.com','example.org','mail.net'])[CAST(c_custkey % 3 AS INT) + 1] || '>'
         AS from_header,
       regexp_extract(
         c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@' ||
         (['acme.com','example.org','mail.net'])[CAST(c_custkey % 3 AS INT) + 1] || '>',
         '<([^<>@ ]+@[^<>@ ]+)>', 1) AS from_address
FROM customer
"""


def email_address_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain rollup over :func:`email_parsed` (the round-1 query shape,
    kept as API)."""
    return (
        email_parsed(spark, sf_dir)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("sender_count"))
        .orderBy("domain")
    )


def _hierarchy_self_join_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered core of :func:`hierarchy_self_join` — the structural
    suite consumes this so the per-arm sort (dead under its union, and
    paying a range-bound sampling job that re-executes the self-join)
    never enters the plan (r13; the r12 lsh-suite pattern)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    parents = orders.groupBy("o_custkey").agg(F.min("o_orderkey").alias("parent_orderkey"))
    child = orders.alias("c")
    parent = orders.alias("p")
    return (
        child.join(F.broadcast(parents), "o_custkey")
        .join(parent, F.col("parent_orderkey") == F.col("p.o_orderkey"))
        .filter(F.col("c.o_orderkey") != F.col("parent_orderkey"))
        .select(
            F.col("c.o_orderkey").alias("orderkey"),
            F.col("parent_orderkey"),
            F.col("c.o_custkey").alias("custkey"),
            F.datediff(F.col("c.o_orderdate"), F.col("p.o_orderdate")).cast("long").alias(
                "days_after_first"
            ),
        )
    )


def hierarchy_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: parent-reference self-join — each order joined to its
    customer's first order (the version-chain ``parent_id`` shape,
    reference ``020_documents.sql:24``, ``050_entities.sql:16``)."""
    return _hierarchy_self_join_core(spark, sf_dir).orderBy("orderkey")


HIERARCHY_SELF_JOIN_SQL = """
WITH parents AS (
  SELECT o_custkey, MIN(o_orderkey) AS parent_orderkey FROM orders GROUP BY o_custkey
)
SELECT c.o_orderkey AS orderkey,
       parents.parent_orderkey,
       c.o_custkey AS custkey,
       CAST(date_diff('day', p.o_orderdate, c.o_orderdate) AS BIGINT) AS days_after_first
FROM orders c
JOIN parents ON c.o_custkey = parents.o_custkey
JOIN orders p ON parents.parent_orderkey = p.o_orderkey
WHERE c.o_orderkey <> parents.parent_orderkey
ORDER BY orderkey
"""


def interval_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: equi + date-range join — line items shipped within 90 days of
    their order date (the relationship start/end-date shape, reference
    ``051_entity_relationships.sql:8-14``).  Equi key carries the join;
    the range predicate filters post-match, so no O(n^2) blowup."""
    return _interval_join_shipments_core(spark, sf_dir).orderBy("o_orderpriority")


def _interval_join_shipments_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered core (suite arm — see :func:`_hierarchy_self_join_core`)."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") <= F.date_add(F.col("o_orderdate"), 90))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("shipments_within_90d"),
            F.round(
                F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 4
            ).alias("avg_lag_days"),
        )
    )


INTERVAL_JOIN_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS shipments_within_90d,
       ROUND(AVG(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_lag_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


CRITICAL_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE")


def om_document_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: document-level confidence = weighted field average, scaled by
    critical-field coverage when below 80% (reference
    ``om_confidence.py:119-146``).  Mapped: customer = document, its
    orders = fields, critical fields = orders in 3 named segments."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    fields = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_mktsegment",
            # per-field confidence + weight synthesized deterministically
            ((F.col("o_orderkey") % 50).cast("double") / 100.0 + 0.5).alias("conf"),
            ((F.col("o_orderkey") % 3) + 1).cast("double").alias("weight"),
        )
    )
    per_doc = fields.groupBy("c_custkey").agg(
        (
            F.sum((F.col("conf") * F.col("weight")).cast("decimal(30,6)")).cast("double")
            / F.sum("weight")
        ).alias("base_confidence"),
        F.size(
            F.array_intersect(
                F.collect_set("c_mktsegment"),
                F.array(*[F.lit(s) for s in CRITICAL_SEGMENTS]),
            )
        ).alias("critical_found"),
    )
    coverage = F.col("critical_found") / F.lit(len(CRITICAL_SEGMENTS))
    scaled = F.when(
        coverage < 0.8, F.col("base_confidence") * (0.5 + 0.5 * coverage)
    ).otherwise(F.col("base_confidence"))
    return per_doc.select(
        "c_custkey",
        rnd(F.col("base_confidence")).alias("base_confidence"),
        F.col("critical_found").cast("long").alias("critical_found"),
        rnd(F.greatest(F.lit(0.0), F.least(F.lit(1.0), scaled))).alias(
            "document_confidence"
        ),
    ).orderBy("c_custkey")


OM_DOCUMENT_CONFIDENCE_SQL = """
WITH fields AS (
  SELECT c_custkey, c_mktsegment,
         CAST(o_orderkey % 50 AS DOUBLE) / 100.0 + 0.5 AS conf,
         CAST((o_orderkey % 3) + 1 AS DOUBLE) AS weight
  FROM orders JOIN customer ON o_custkey = c_custkey
), per_doc AS (
  SELECT c_custkey,
         CAST(SUM(CAST(conf * weight AS DECIMAL(30,6))) AS DOUBLE) / SUM(weight) AS base_confidence,
         len(list_intersect(list(DISTINCT c_mktsegment),
                            ['AUTOMOBILE','BUILDING','FURNITURE'])) AS critical_found
  FROM fields GROUP BY c_custkey
)
SELECT c_custkey,
       (FLOOR((base_confidence) * 1000000.0 + 0.5) / 1000000.0) AS base_confidence,
       CAST(critical_found AS BIGINT) AS critical_found,
       (FLOOR((GREATEST(0.0, LEAST(1.0,
         CASE WHEN critical_found / 3.0 < 0.8
              THEN base_confidence * (0.5 + 0.5 * critical_found / 3.0)
              ELSE base_confidence END))) * 1000000.0 + 0.5) / 1000000.0) AS document_confidence
FROM per_doc ORDER BY c_custkey
"""


# email_address_extract -> normalize_roundtrips (kind='email');
# om_document_confidence -> suites.om_full_validation_report (r5
# consolidation); hierarchy_self_join + interval_join_shipments ->
# suites.structural_join_suite (r6 consolidation, COVERAGE.md merge
# table)
QUERIES: dict[str, QuerySpec] = {}
