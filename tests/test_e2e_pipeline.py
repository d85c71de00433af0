"""End-to-end ETL spine (SURVEY.md §3.3): binary ingest -> parser
routing -> PII redaction -> field extraction (stub) -> EAV persistence
with versioning -> pivot -> analytics.  One integration test through the
whole engine, mirroring the reference's upload->extract->analyze flow."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from car_etl_spark.functions import normalizers as N
from car_etl_spark.functions import udfs
from car_etl_spark.operators import ingest as I
from car_etl_spark.operators import multimodal as M
from car_etl_spark.operators import pipeline as P


@pytest.fixture(scope="module")
def doc_dir():
    d = tempfile.mkdtemp(prefix="car-etl-e2e-")
    docs = {
        "lease1.txt": "lease agreement tenant Alpha rent details, contact bob@example.com",
        "lease2.txt": "lease agreement tenant Beta monthly rent roll",
        "lease1_dup.txt": "lease agreement tenant Alpha rent details, contact bob@example.com",
        "scan.pdf": b"%PDF-1.4 lease for tenant Gamma",
    }
    for name, content in docs.items():
        mode = "wb" if isinstance(content, bytes) else "w"
        with open(os.path.join(d, name), mode) as f:
            f.write(content)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_full_pipeline(spark, doc_dir):
    # 1. ingest: binaryFile scan + magic-byte mime + sha256 (S2)
    media = M.ingest_binary_dir(spark, doc_dir, tenant_id="t1")
    assert media.count() == 4

    # 2. dedup on (tenant, hash): identical content collapses (J6)
    unique = M.dedup_against_existing(media, existing=None)
    assert unique.count() == 3

    # 3. route + parse with fallback chain (S7)
    parsed = I.route_and_parse(unique)
    assert parsed.filter(F.col("parsed_text").isNotNull()).count() == 3

    # 4. PII redaction before anything persists (S10/X7)
    redacted = parsed.withColumn(
        "parsed_text", udfs.redact_pii(F.col("parsed_text"), "mask")
    )
    leaked = redacted.filter(F.col("parsed_text").contains("bob@example.com")).count()
    assert leaked == 0
    assert redacted.filter(F.col("parsed_text").contains("[EMAIL]")).count() == 1

    # 5. field extraction stub -> ExtractionResult JSON (X1)
    extracted = redacted.select(
        F.col("file_hash").alias("document_id"),
        F.col("path").alias("extracted_at"),  # deterministic order key
        udfs.llm_extract_fields(F.col("parsed_text")).alias("result_json"),
    )

    # 6. versioned persistence: re-extract one doc -> version 2 demotes v1
    batch1 = P.assign_versions(extracted, existing=None, order_col="extracted_at")
    re_extract = extracted.limit(1)
    batch2 = P.assign_versions(re_extract, existing=batch1, order_col="extracted_at")
    all_versions = batch1.unionByName(batch2)
    current = P.mark_current(all_versions)
    redone_doc = re_extract.collect()[0]["document_id"]
    versions = {
        (r["document_id"], r["version"]): r["is_current"] for r in current.collect()
    }
    assert versions[(redone_doc, 1)] is False  # demoted
    assert versions[(redone_doc, 2)] is True
    assert len(versions) == 4  # 3 docs + 1 re-extraction

    # 7. EAV: JSON -> tall fields -> pivot with normalizers (§1.1/F8)
    fields_schema = "map<string, struct<value string, confidence double, page int>>"
    tall = (
        current.filter(F.col("is_current"))
        .select(
            "document_id",
            F.explode(
                F.from_json(F.get_json_object("result_json", "$.fields"), fields_schema)
            ).alias("field_name", "f"),
        )
        .select(
            F.col("document_id").alias("extraction_id"),
            "field_name",
            F.col("f.value").alias("field_value"),
            F.col("f.confidence").alias("confidence"),
        )
    )
    wide = P.pivot_eav(
        tall,
        {
            "tenant_name": None,
            "base_rent": N.normalize_currency,
            "square_footage": N.normalize_integer,
        },
    )
    rows = wide.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["tenant_name"] is not None
        assert isinstance(r["base_rent"], float) and r["base_rent"] >= 1000.0
        assert isinstance(r["square_footage"], int) and r["square_footage"] >= 500

    # 8. analytics over the pivoted extractions (A1/A2)
    summary = wide.agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.sum("base_rent"), 2).alias("total_rent"),
        F.round(F.avg("square_footage"), 1).alias("avg_sf"),
    ).collect()[0]
    assert summary["docs"] == 3 and summary["total_rent"] > 0
