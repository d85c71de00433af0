"""PII detection/redaction as an oracle-checked query (F33 + X6/X7).

The regex-deterministic subset of the reference's PII pipeline
(``config/pii_patterns.yaml:6-60``, ``src/extraction/redactor.py:
21-103``) over a synthesized profile text: TPC-H ``customer`` carries a
real phone-shaped column (``c_phone``), and emails / SSNs are composed
deterministically from the key — so detection counts are non-trivial,
engine-portable, and independent of any external corpus.

Two hard signals in one hash:

- **detection**: per entity type, how many profiles contain it and how
  many total matches — the detect regexes against DuckDB's RE2.
- **redaction completeness**: matches remaining AFTER ``redact_pii``'s
  mask pass (``residual_matches``) — must be 0 for every type, and the
  oracle recomputes the same masked text, so a regex drifting between
  detect and redact flips the row.

The patterns are RE2-safe by construction (``\\b``, ``\\d``, classes —
no lookarounds), the same constants ``functions.udfs.redact_pii``
applies at the chunk-sink boundary (S10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_etl_spark.functions.udfs import PII_PATTERNS, redact_pii
from car_etl_spark.queries import QuerySpec
from car_etl_spark.tables import load_tables


def _profile_text():
    """Deterministic per-customer profile line with a phone-shaped
    token, an email, and (for every 7th key) an SSN-shaped token — all
    synthesized from the key, so counts are non-trivial and identical
    in both engines (the driver's customer table carries no contact
    columns)."""
    k = F.col("c_custkey")
    domain = F.element_at(
        F.array(F.lit("acme.com"), F.lit("example.org"), F.lit("mail.net")),
        (k % 3 + 1).cast("int"),
    )
    phone = F.concat(
        F.lpad(((k * 13) % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad(((k * 17) % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad(((k * 19) % 10000).cast("string"), 4, "0"),
    )
    ssn = F.concat(
        F.lpad(((k * 7) % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((k % 100).cast("string"), 2, "0"), F.lit("-"),
        F.lpad(((k * 3) % 10000).cast("string"), 4, "0"),
    )
    return F.concat(
        F.col("c_name"), F.lit(" ph "), phone,
        F.lit(" em user"), k.cast("string"), F.lit("@"), domain,
        F.when(k % 7 == 0, F.concat(F.lit(" id "), ssn)).otherwise(F.lit("")),
    )


def pii_entity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-type detection + redaction-completeness report:
    ``(entity_type, docs_with_entity, total_matches, residual_matches)``
    — one corpus pass (all counts are map-side column expressions; the
    only shuffle is the single global aggregate), unpivoted to the
    entity-type grain."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    text = _profile_text()
    staged = cust.select(
        *[
            F.regexp_count(text, F.lit(pat)).alias(f"__c_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
        *[
            F.regexp_count(redact_pii(text, "mask"), F.lit(pat)).alias(f"__r_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
    )
    agg = staged.agg(
        *[
            e
            for name in PII_PATTERNS
            for e in (
                F.sum(F.when(F.col(f"__c_{name}") > 0, 1).otherwise(0))
                .cast("long")
                .alias(f"__docs_{name}"),
                F.sum(f"__c_{name}").cast("long").alias(f"__tot_{name}"),
                F.sum(f"__r_{name}").cast("long").alias(f"__res_{name}"),
            )
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("entity_type"),
                F.col(f"__docs_{name}").alias("docs_with_entity"),
                F.col(f"__tot_{name}").alias("total_matches"),
                F.col(f"__res_{name}").alias("residual_matches"),
            )
            for name in PII_PATTERNS
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("entity_type")
    )


def _pii_sql() -> str:
    k = "c_custkey"
    phone = (
        f"lpad(CAST(({k} * 13) % 1000 AS VARCHAR), 3, '0') || '-' || "
        f"lpad(CAST(({k} * 17) % 1000 AS VARCHAR), 3, '0') || '-' || "
        f"lpad(CAST(({k} * 19) % 10000 AS VARCHAR), 4, '0')"
    )
    profile = (
        f"c_name || ' ph ' || {phone} || ' em user' || CAST({k} AS VARCHAR) || '@' || "
        f"(['acme.com','example.org','mail.net'])[CAST({k} % 3 AS INT) + 1] || "
        f"CASE WHEN {k} % 7 = 0 THEN ' id ' || "
        f"lpad(CAST(({k} * 7) % 1000 AS VARCHAR), 3, '0') || '-' || "
        f"lpad(CAST({k} % 100 AS VARCHAR), 2, '0') || '-' || "
        f"lpad(CAST(({k} * 3) % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    # mask in PII_PATTERNS iteration order, exactly like redact_pii
    masked = "text"
    for name, pat in PII_PATTERNS.items():
        masked = f"regexp_replace({masked}, '{pat}', '[{name}]', 'g')"
    cnt_cols = ",\n         ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS c_{name}, "
        f"len(regexp_extract_all(masked, '{pat}')) AS r_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS entity_type, "
        f"CAST(SUM(CASE WHEN c_{name} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_entity, "
        f"CAST(SUM(c_{name}) AS BIGINT) AS total_matches, "
        f"CAST(SUM(r_{name}) AS BIGINT) AS residual_matches FROM counts"
        for name in PII_PATTERNS
    )
    return f"""
WITH prof AS (
  SELECT {profile} AS text FROM customer
), with_mask AS (
  SELECT text, {masked} AS masked FROM prof
), counts AS (
  SELECT {cnt_cols}
  FROM with_mask
)
SELECT * FROM (
{arms}
) ORDER BY entity_type
"""


QUERIES: dict[str, QuerySpec] = {
    "pii_entity_counts": QuerySpec(pii_entity_counts, _pii_sql(), ("pii", "redaction")),
}
