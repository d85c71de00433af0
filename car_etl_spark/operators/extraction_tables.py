"""Nested extracted-table operator (S8) — ExtractedTable{headers, rows}
as a first-class nested column, exploded to child rows.

The reference parses spreadsheets into ``ExtractedTable(table_name,
headers, rows, page_number, confidence)`` payloads
(``src/extraction/parsers/pandas.py:22-80``) and persists them as JSONB
``headers``/``rows`` child records of an extraction
(``supabase/migrations/032_extraction_tables.sql:5-14``).  The Spark
mapping per SURVEY.md §1.1:

- one row per extracted table, ``headers array<string>``,
  ``rows array<array<string>>`` (cell matrix, header-aligned);
- child-row materialization is ``posexplode(rows)`` — row_index is the
  JSONB array ordinal;
- cell access by header NAME resolves the position from the headers
  array at runtime (``array_position``), so the operator works for any
  table vocabulary without schema inference.

At 100 TB: building the nested column is one groupBy shuffle on the
extraction key; the explode is a map-only stage; header-aligned access
is pure Column expressions inside codegen.

The bytes->sheets decode kernel feeding this model lives in
:mod:`car_etl_spark.operators.spreadsheet` (real stdlib SpreadsheetML +
zipped-CSV decoding, openpyxl when importable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: schema of one extracted table, mirroring the reference's model
#: (parsers/base.py ExtractedTable / 032_extraction_tables.sql:5-14)
EXTRACTED_TABLE_SCHEMA = (
    "table_name string, headers array<string>, rows array<array<string>>, "
    "page_number int, confidence double"
)


def explode_extracted_tables(nested: DataFrame, *id_cols: str) -> DataFrame:
    """One child row per table row: (id..., table_name, headers,
    row_index, cells).  ``row_index`` is the 0-based ordinal within the
    table (the JSONB array position in the reference's storage)."""
    return nested.select(
        *id_cols,
        "table_name",
        "headers",
        F.posexplode("rows").alias("row_index", "cells"),
    ).withColumn("row_index", F.col("row_index").cast("long"))


def cell(header_name: str) -> Column:
    """Header-aligned cell access on an exploded frame: the cell under
    ``header_name``, NULL when the header is absent OR the row is
    ragged (fewer cells than the header position — parsers emit short
    rows; under ANSI mode a plain element_at would kill the job on the
    first one, so this uses try_element_at).  Resolves position from
    the ``headers`` array per row — no fixed vocabulary needed."""
    pos = F.array_position(F.col("headers"), F.lit(header_name))
    return F.when(pos > 0, F.try_element_at(F.col("cells"), pos.cast("int")))
