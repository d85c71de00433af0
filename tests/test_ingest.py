"""Tests for bulk-ZIP explode (S3) and parser routing/fallback (S7)."""

from __future__ import annotations

import io
import os
import shutil
import tempfile
import zipfile

import pytest
from pyspark.sql import functions as F

from car_etl_spark.operators import ingest as I
from car_etl_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def zip_dir():
    d = tempfile.mkdtemp(prefix="car-etl-zip-")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a.txt", "hello from member a")
        zf.writestr("sub/b.txt", "second member")
        zf.writestr("bomb.bin", b"\x00" * 200000)  # compresses ~1000x
    with open(os.path.join(d, "bundle.zip"), "wb") as f:
        f.write(buf.getvalue())
    with open(os.path.join(d, "not_a.zip"), "wb") as f:
        f.write(b"PK\x03\x04 truncated garbage")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_zip_explode_members_and_guards(spark, zip_dir):
    archives = spark.read.format("binaryFile").load(zip_dir)
    members = I.explode_zip_members(archives.select("path", "content")).collect()
    by_name = {r.member_name: r for r in members if r.member_name}
    assert by_name["a.txt"].member_bytes == b"hello from member a"
    assert by_name["a.txt"].rejected_reason is None
    assert len(by_name["a.txt"].member_hash) == 64
    assert by_name["sub/b.txt"].member_size == 13
    # zip-bomb guard: member present but rejected, bytes withheld
    assert by_name["bomb.bin"].rejected_reason == "suspicious_compression_ratio"
    assert by_name["bomb.bin"].member_bytes is None
    # corrupt archive -> explicit bad_zip row
    bad = [r for r in members if r.rejected_reason == "bad_zip"]
    assert len(bad) == 1


def test_parser_routing_wildcards(spark):
    df = spark.createDataFrame(
        [("application/pdf",), ("text/plain",), ("text/csv",), ("image/png",), ("application/json",)],
        ["mime_type"],
    )
    rows = df.select(
        "mime_type", I.route_parser_chain(F.col("mime_type")).alias("chain")
    ).collect()
    chains = {r.mime_type: r.chain for r in rows}
    assert chains["application/pdf"] == ["pdf_text", "ocr_stub"]
    assert chains["text/plain"] == ["plain_text"]
    assert chains["text/csv"] == ["plain_text"]  # wildcard text/*
    assert chains["image/png"] == ["ocr_stub"]  # wildcard image/*
    assert chains["application/json"] == ["plain_text"]  # default


def test_route_and_parse_fallback(spark):
    rows = [
        ("pdf_ok", "application/pdf", b"%PDF-1.7 Lease Agreement body"),
        ("pdf_binary", "application/pdf", b"%PDF\x01\x02\xff\xfebinary"),
        ("text_ok", "text/plain", b"plain text content"),
        ("image", "image/png", b"\x89PNG....bytes"),
    ]
    media = spark.createDataFrame(rows, ["name", "mime_type", "content"])
    out = {r.name: r for r in I.route_and_parse(media).collect()}
    assert out["pdf_ok"].parser_used == "pdf_text"
    assert "Lease Agreement" in out["pdf_ok"].parsed_text
    assert out["text_ok"].parser_used == "plain_text"
    assert out["text_ok"].parsed_text == "plain text content"
    # image routes straight to the OCR stub
    assert out["image"].parser_used == "ocr_stub"
    assert out["image"].parsed_text.startswith("[ocr:")
    # a PDF whose text layer fails falls back to the OCR stub
    assert out["pdf_binary"].parser_used in ("pdf_text", "ocr_stub")
    assert out["pdf_binary"].parsed_text is not None


# ---------------------------------------------------------------------------
# S8: nested extracted-table operator (ExtractedTable{headers, rows})


def test_extracted_tables_explode_and_cell_access(spark):
    from car_etl_spark.operators import extraction_tables as X

    nested = spark.createDataFrame(
        [
            (
                "ext1",
                "rent_roll",
                ["unit", "tenant", "rent"],
                [["101", "Acme", "1200.00"], ["102", "Globex", "1350.50"]],
                1,
                0.95,
            ),
            ("ext2", "empty_sheet", ["a"], [], None, 1.0),
            # different header vocabulary — cell() must resolve per row
            ("ext3", "expenses", ["rent", "opex"], [["900.00", "50.00"]], 2, 1.0),
        ],
        f"extraction_id string, {X.EXTRACTED_TABLE_SCHEMA}",
    )
    child = X.explode_extracted_tables(nested, "extraction_id")
    rows = child.select(
        "extraction_id",
        "table_name",
        "row_index",
        X.cell("rent").alias("rent"),
        X.cell("tenant").alias("tenant"),
        X.cell("missing_header").alias("absent"),
    ).orderBy("extraction_id", "row_index").collect()
    # empty rows array -> no child rows (ext2 disappears, like an empty sheet)
    assert [r.extraction_id for r in rows] == ["ext1", "ext1", "ext3"]
    assert [r.row_index for r in rows] == [0, 1, 0]
    # header-aligned access follows each row's own vocabulary
    assert [r.rent for r in rows] == ["1200.00", "1350.50", "900.00"]
    assert [r.tenant for r in rows] == ["Acme", "Globex", None]
    assert all(r.absent is None for r in rows)
    # row_index is long (driver schema contract)
    assert dict(child.dtypes)["row_index"] == "bigint"


# ---------------------------------------------------------------------------
# Landing sink contract (S2/S5 -> SURVEY §1.2)


def test_landing_partition_pruning_two_tenants_two_days(spark, tmp_path):
    """Landed documents partition by (tenant, date); a tenant+date read
    prunes to ONE directory before opening any file, and appends add
    partitions without rewriting history."""
    from datetime import date

    df = spark.createDataFrame(
        [
            ("t1", date(2026, 1, 1), "d1"),
            ("t1", date(2026, 1, 2), "d2"),
            ("t2", date(2026, 1, 1), "d3"),
            ("t2", date(2026, 1, 2), "d4"),
        ],
        "tenant_id string, ingest_date date, doc string",
    )
    path = str(tmp_path / "landing")
    I.land_documents(df, path)
    I.land_documents(df.withColumn("doc", F.concat(F.col("doc"), F.lit("x"))), path)
    # the directory layout IS the contract
    assert (tmp_path / "landing" / "tenant_id=t1" / "ingest_date=2026-01-01").is_dir()
    got = I.read_landed(spark, path, tenant_id="t1", on_date="2026-01-01")
    assert sorted(r.doc for r in got.collect()) == ["d1", "d1x"]
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert pf and "tenant_id" in pf[0] and "ingest_date" in pf[0], plan[:2000]
    assert "PartitionFilters: []" not in plan
    # incremental-readback form: since_date prunes history partitions
    # by directory (>= bound), the ConnectorSync idempotency path
    inc = I.read_landed(spark, path, tenant_id="t1", since_date="2026-01-02")
    assert sorted(r.doc for r in inc.collect()) == ["d2", "d2x"]
    plan2 = inc._jdf.queryExecution().executedPlan().toString()
    pf2 = [line for line in plan2.splitlines() if "PartitionFilters" in line]
    assert pf2 and "ingest_date" in pf2[0], plan2[:2000]


def test_ingest_binary_dir_carries_landing_partition_columns(spark, zip_dir):
    """The S2 scan produces both halves of the landing partition key."""
    media = M.ingest_binary_dir(spark, zip_dir, tenant_id="t7")
    rows = media.select("tenant_id", "ingest_date").collect()
    assert rows and all(r.tenant_id == "t7" and r.ingest_date is not None for r in rows)
    assert dict(media.dtypes)["ingest_date"] == "date"
