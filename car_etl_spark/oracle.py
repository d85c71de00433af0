"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
tables and compares row count, column names, and order-insensitive
values (sorted by column name, rows sorted, NaN-safe).  Used by the test
suite at sf0.001 so every oracle mismatch is caught before the driver's
sf0.01 run.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from car_etl_spark.tables import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def run_oracle(sql: str, sf_dir: str) -> "object":
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _canon_cell(v: object) -> object:
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v == int(v) and abs(v) < 2**52:
            return int(v)  # 5.0 == 5 across engines
        return round(v, 9)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon_rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(rec[c]) for c in cols)
        for rec in df.to_dict(orient="records")
    ]
    return sorted(rows, key=repr)


def compare(
    name: str, spark: SparkSession, sf_dir: str, fn, oracle: str
) -> CompareResult:
    sdf = fn(spark, sf_dir).toPandas()
    odf = run_oracle(oracle, sf_dir)
    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            name, False, len(sdf), len(odf),
            f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
        )
    if len(sdf) != len(odf):
        return CompareResult(name, False, len(sdf), len(odf), "row count mismatch")
    srows, orows = _canon_rows(sdf), _canon_rows(odf)
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            return CompareResult(
                name, False, len(sdf), len(odf),
                f"value mismatch at sorted-row {i}:\n  spark : {a}\n  oracle: {b}",
            )
    return CompareResult(name, True, len(sdf), len(odf))
