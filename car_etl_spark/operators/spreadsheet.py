"""S8: the spreadsheet decode kernel — workbook bytes to
ExtractedTable{headers, rows} (reference
``src/extraction/parsers/pandas.py:22-80``: pd.read_excel over all
sheets, headers from the first row, NaN -> "", one ExtractedTable per
sheet with confidence 1.0 and no page number).

Two real decode paths, no stubs:

- **XLSX** (the reference's primary format): an .xlsx file is a ZIP of
  SpreadsheetML XML — decoded here with the stdlib (zipfile +
  ElementTree): workbook.xml + its rels map sheet names to worksheet
  parts in order, sharedStrings.xml resolves ``t="s"`` cells, inline
  strings/booleans/numbers read from the cell element, A1-style
  references place cells (gaps fill with "").  openpyxl, when
  importable, is preferred for full-fidelity decoding (formats this
  subset reader skips: formula caches with no value, rich formatting);
  the stdlib path covers the value-bearing cases and keeps the kernel
  dependency-free in this container.
- **Zipped-CSV workbooks**: a ZIP whose members are ``<sheet>.csv`` —
  one ExtractedTable per member, sheet name = member stem.

Cell matrix contract matches ``operators/extraction_tables.py``: all
cells are strings, headers = first row, data rows may be ragged (the
``cell()`` accessor null-pads), empty cells are "".

Spark plumbing: ``parse_workbooks`` is an Arrow-batched pandas_udf over
a binary content column returning a ParseResult-shaped struct
(tables array + sheet_count + error) — decode failures land in the
error field per document instead of failing the job, mirroring the
reference's per-document ParserError handling.
"""

from __future__ import annotations

import csv
import io
import re
import zipfile
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: ParseResult-shaped output of the decode UDF; the tables element type
#: mirrors operators/extraction_tables.EXTRACTED_TABLE_SCHEMA
PARSE_RESULT_SCHEMA = (
    "struct<tables: array<struct<table_name: string, headers: array<string>, "
    "rows: array<array<string>>, page_number: int, confidence: double>>, "
    "sheet_count: int, error: string>"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """A1-style column letters -> 0-based index ('A'->0, 'AA'->26)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _element_text(el) -> str:
    """Concatenated text of every <t> descendant (plain + rich runs)."""
    parts = []
    for node in el.iter():
        if _local(node.tag) == "t" and node.text:
            parts.append(node.text)
    return "".join(parts)


def _decode_xlsx_stdlib(zf: zipfile.ZipFile) -> list[dict]:
    # shared strings (optional part)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = [_element_text(si) for si in root if _local(si.tag) == "si"]

    # sheet name -> worksheet part, in workbook order, via the rels part
    rels: dict[str, str] = {}
    rels_part = "xl/_rels/workbook.xml.rels"
    if rels_part in zf.namelist():
        for rel in ElementTree.fromstring(zf.read(rels_part)):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target[1:]
            elif not target.startswith("xl/"):
                target = "xl/" + target
            rels[rel.get("Id", "")] = target
    sheets: list[tuple[str, str]] = []
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    for el in wb.iter():
        if _local(el.tag) == "sheet":
            part = rels.get(el.get(RID, ""), "")
            if part:
                sheets.append((el.get("name", f"sheet{len(sheets) + 1}"), part))
    if not sheets:  # rels missing/odd: fall back to part order
        parts = sorted(
            n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        sheets = [(f"sheet{i + 1}", p) for i, p in enumerate(parts)]

    tables = []
    for sheet_name, part in sheets:
        root = ElementTree.fromstring(zf.read(part))
        matrix: list[list[str]] = []
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            cells: list[str] = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                ref = c.get("r", "")
                idx = _col_index(ref) if ref else len(cells)
                ctype = c.get("t", "n")
                value = ""
                if ctype == "inlineStr":
                    value = _element_text(c)
                else:
                    v = next((ch for ch in c if _local(ch.tag) == "v"), None)
                    raw = v.text if v is not None and v.text is not None else ""
                    if ctype == "s":
                        si = int(raw) if raw else -1
                        value = shared[si] if 0 <= si < len(shared) else ""
                    elif ctype == "b":
                        value = "TRUE" if raw == "1" else "FALSE"
                    else:
                        value = raw
                while len(cells) < idx:
                    cells.append("")
                if idx < len(cells):
                    cells[idx] = value
                else:
                    cells.append(value)
            matrix.append(cells)
        headers = [str(h) for h in matrix[0]] if matrix else []
        tables.append(
            {
                "table_name": sheet_name,
                "headers": headers,
                "rows": [[str(x) for x in r] for r in matrix[1:]],
                "page_number": None,  # spreadsheets have no pages
                "confidence": 1.0,
            }
        )
    return tables


def _decode_xlsx_openpyxl(content: bytes) -> list[dict]:
    import openpyxl  # full-fidelity path when the lib exists

    wb = openpyxl.load_workbook(io.BytesIO(content), read_only=True, data_only=True)
    tables = []
    for ws in wb.worksheets:
        matrix = [
            ["" if c is None else str(c) for c in row] for row in ws.iter_rows(values_only=True)
        ]
        tables.append(
            {
                "table_name": ws.title,
                "headers": matrix[0] if matrix else [],
                "rows": matrix[1:],
                "page_number": None,
                "confidence": 1.0,
            }
        )
    return tables


def _decode_zipped_csv(zf: zipfile.ZipFile) -> list[dict]:
    tables = []
    for name in zf.namelist():
        if not name.lower().endswith(".csv") or name.endswith("/"):
            continue
        text = zf.read(name).decode("utf-8", errors="replace")
        matrix = [list(r) for r in csv.reader(io.StringIO(text))]
        stem = name.rsplit("/", 1)[-1][: -len(".csv")]
        tables.append(
            {
                "table_name": stem,
                "headers": matrix[0] if matrix else [],
                "rows": matrix[1:],
                "page_number": None,
                "confidence": 1.0,
            }
        )
    return tables


def decode_workbook(content: bytes) -> dict:
    """Bytes -> ParseResult-shaped dict: {tables, sheet_count, error}."""
    if content is None or len(content) == 0:
        return {"tables": [], "sheet_count": 0, "error": "empty workbook"}
    if content[:4] != b"PK\x03\x04":
        return {"tables": [], "sheet_count": 0, "error": "not a ZIP container"}
    try:
        with zipfile.ZipFile(io.BytesIO(content)) as zf:
            names = zf.namelist()
            if "xl/workbook.xml" in names:
                try:
                    tables = _decode_xlsx_openpyxl(content)
                except ImportError:
                    tables = _decode_xlsx_stdlib(zf)
            elif any(n.lower().endswith(".csv") for n in names):
                tables = _decode_zipped_csv(zf)
            else:
                return {
                    "tables": [],
                    "sheet_count": 0,
                    "error": "ZIP is neither xlsx nor zipped-csv workbook",
                }
    except Exception as e:  # per-document failure, never a job failure
        return {"tables": [], "sheet_count": 0, "error": f"{type(e).__name__}: {e}"}
    if not tables:
        return {"tables": [], "sheet_count": 0, "error": "workbook has no sheets"}
    return {"tables": tables, "sheet_count": len(tables), "error": None}


def parse_workbooks(
    df: DataFrame, content_col: str = "content", *keep: str
) -> DataFrame:
    """Decode a binary workbook column into nested ExtractedTable rows:
    output one row per (doc, sheet) with the EXTRACTED_TABLE_SCHEMA
    columns + ``parse_error`` (NULL on success; failed documents emit
    ONE row with NULL table fields so the error is never silently
    dropped by the explode)."""

    @pandas_udf(PARSE_RESULT_SCHEMA)
    def decode(contents: pd.Series) -> pd.DataFrame:
        results = [decode_workbook(c) for c in contents]
        return pd.DataFrame(results)

    parsed = df.select(*keep, decode(F.col(content_col)).alias("pr"))
    ok = parsed.filter(F.col("pr.error").isNull()).select(
        *keep, F.explode("pr.tables").alias("t"), F.lit(None).cast("string").alias("parse_error")
    ).select(
        *keep,
        "t.table_name",
        "t.headers",
        "t.rows",
        "t.page_number",
        "t.confidence",
        "parse_error",
    )
    failed = parsed.filter(F.col("pr.error").isNotNull()).select(
        *keep,
        F.lit(None).cast("string").alias("table_name"),
        F.lit(None).cast("array<string>").alias("headers"),
        F.lit(None).cast("array<array<string>>").alias("rows"),
        F.lit(None).cast("int").alias("page_number"),
        F.lit(None).cast("double").alias("confidence"),
        F.col("pr.error").alias("parse_error"),
    )
    return ok.unionByName(failed)
