"""S8 spreadsheet decode kernel: workbook bytes -> ExtractedTable rows.

Round-trips generated workbooks (both supported containers) through the
Spark plumbing and the nested-table operators — the decode is REAL
(stdlib SpreadsheetML / zipped-CSV), not a stub.
"""

from __future__ import annotations

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from car_etl_spark.operators import spreadsheet as SS
from car_etl_spark.operators.extraction_tables import cell, explode_extracted_tables


def _zip_bytes(members: dict[str, str | bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _csv_workbook() -> bytes:
    return _zip_bytes(
        {
            "leases.csv": 'tenant,rent,unit\nAcme LLC,1200,A-1\n"Büro, GmbH",980,B-2\nShortRow\n',
            "expenses.csv": "category,amount\nutilities,300\n",
        }
    )


def _minimal_xlsx() -> bytes:
    """A from-scratch SpreadsheetML workbook: 2 sheets, shared + inline
    strings, numbers, booleans, a skipped cell (B3 empty via refs)."""
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    workbook = (
        f'<?xml version="1.0"?><workbook {ns} {rns}><sheets>'
        '<sheet name="rent roll" sheetId="1" r:id="rId1"/>'
        '<sheet name="summary" sheetId="2" r:id="rId2"/>'
        "</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="x" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    shared = (
        f'<?xml version="1.0"?><sst {ns} count="3" uniqueCount="3">'
        "<si><t>tenant</t></si><si><t>rent</t></si>"
        "<si><r><t>Acme </t></r><r><t>LLC</t></r></si></sst>"
    )
    sheet1 = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="inlineStr"><is><t>active</t></is></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1200.5</v></c>'
        '<c r="C2" t="b"><v>1</v></c></row>'
        '<row r="3"><c r="A3" t="inlineStr"><is><t>Gap Co</t></is></c>'
        '<c r="C3" t="b"><v>0</v></c></row>'
        "</sheetData></worksheet>"
    )
    sheet2 = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row><c t="inlineStr"><is><t>total</t></is></c></row>'
        "<row><c><v>42</v></c></row>"
        "</sheetData></worksheet>"
    )
    return _zip_bytes(
        {
            "[Content_Types].xml": "<Types/>",
            "xl/workbook.xml": workbook,
            "xl/_rels/workbook.xml.rels": rels,
            "xl/sharedStrings.xml": shared,
            "xl/worksheets/sheet1.xml": sheet1,
            "xl/worksheets/sheet2.xml": sheet2,
        }
    )


def test_decode_zipped_csv_kernel():
    out = SS.decode_workbook(_csv_workbook())
    assert out["error"] is None and out["sheet_count"] == 2
    by_name = {t["table_name"]: t for t in out["tables"]}
    leases = by_name["leases"]
    assert leases["headers"] == ["tenant", "rent", "unit"]
    assert leases["rows"][0] == ["Acme LLC", "1200", "A-1"]
    assert leases["rows"][1] == ["Büro, GmbH", "980", "B-2"]  # quoted comma
    assert leases["rows"][2] == ["ShortRow"]  # ragged rows preserved
    assert by_name["expenses"]["rows"] == [["utilities", "300"]]


def test_decode_xlsx_kernel_stdlib():
    out = SS.decode_workbook(_minimal_xlsx())
    assert out["error"] is None and out["sheet_count"] == 2
    by_name = {t["table_name"]: t for t in out["tables"]}
    rr = by_name["rent roll"]
    # shared strings, rich runs, inline strings in the header row
    assert rr["headers"] == ["tenant", "rent", "active"]
    assert rr["rows"][0] == ["Acme LLC", "1200.5", "TRUE"]
    # skipped B3 fills with "" so C3 keeps its position
    assert rr["rows"][1] == ["Gap Co", "", "FALSE"]
    assert by_name["summary"]["headers"] == ["total"]
    assert by_name["summary"]["rows"] == [["42"]]


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"", "empty workbook"),
        (b"%PDF-1.4 not a zip", "not a ZIP container"),
        (None, "empty workbook"),
    ],
)
def test_decode_rejects_non_workbooks(payload, msg):
    out = SS.decode_workbook(payload)
    assert out["tables"] == [] and msg in out["error"]


def test_decode_zip_without_sheets_reports_error():
    out = SS.decode_workbook(_zip_bytes({"readme.txt": "hi"}))
    assert "neither xlsx nor zipped-csv" in out["error"]


def test_spark_roundtrip_through_extraction_tables(spark):
    """The full S8 path: binary column -> decode UDF -> nested
    ExtractedTable rows -> posexplode -> header-aligned cell access."""
    rows = [
        (1, _csv_workbook()),
        (2, _minimal_xlsx()),
        (3, b"garbage bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    nested = SS.parse_workbooks(df, "content", "doc_id")

    errs = {r.doc_id: r.parse_error for r in nested.filter(F.col("parse_error").isNotNull()).collect()}
    assert set(errs) == {3} and "ZIP" in errs[3]

    ok = nested.filter(F.col("parse_error").isNull())
    assert ok.count() == 4  # 2 sheets per good workbook

    exploded = explode_extracted_tables(ok, "doc_id", "parse_error")
    leases = (
        exploded.filter(F.col("table_name") == "leases")
        .select("row_index", cell("tenant").alias("tenant"), cell("rent").alias("rent"))
        .orderBy("row_index")
        .collect()
    )
    assert [(r.tenant, r.rent) for r in leases] == [
        ("Acme LLC", "1200"),
        ("Büro, GmbH", "980"),
        ("ShortRow", None),  # ragged row null-pads under the accessor
    ]
    xlsx_rows = (
        exploded.filter(F.col("table_name") == "rent roll")
        .select(cell("tenant").alias("t"), cell("active").alias("a"))
        .orderBy("row_index")
        .collect()
    )
    assert [(r.t, r.a) for r in xlsx_rows] == [("Acme LLC", "TRUE"), ("Gap Co", "FALSE")]
