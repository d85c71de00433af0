"""Nested extracted-table query (S8): build ExtractedTable nested
payloads, explode to child rows, and read cells by header name.

Synthesizes one "extracted table" per customer from their orders (the
rent-roll shape: one spreadsheet per property, one row per lease), runs
the ``operators.extraction_tables`` explode, and emits header-aligned
cells.  The oracle computes the same flattened result relationally —
the nested build/explode round-trip is the Spark-side operator under
test; numeric cells go through DECIMAL so both engines render identical
strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_etl_spark.operators import extraction_tables as X
from car_etl_spark.queries import QuerySpec
from car_etl_spark.tables import load_tables


def build_nested_order_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ExtractedTable per customer: headers + row-per-order cell
    matrix, rows ordered by orderkey (the parser emits sheet rows in
    document order; here the deterministic analog)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cells = F.array(
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    # r12: RANGE-partition on the group key (the eav §2 pattern).  The
    # one range exchange serves the whole tail: it satisfies the
    # groupBy's clustering (agg hash Exchange gone), and because range
    # partitioning on the leading sort key prefix-satisfies the final
    # orderBy("extraction_id","row_index")'s OrderedDistribution, the
    # sort's own range Exchange (and its child-re-executing sampling
    # pass) drops too — only a local Sort remains.  collect_list's
    # partial aggregation packs rows without shrinking them, so the
    # shuffled bytes are unchanged.  Partition count inherits
    # spark.sql.shuffle.partitions — scale-adaptive, not a constant.
    return (
        orders.select("o_custkey", F.struct(F.col("o_orderkey"), cells.alias("cells")).alias("r"))
        .repartitionByRange("o_custkey")
        .groupBy("o_custkey")
        .agg(F.sort_array(F.collect_list("r")).alias("ordered"))
        .select(
            F.col("o_custkey").alias("extraction_id"),
            F.concat(F.lit("orders_"), F.col("o_custkey").cast("string")).alias("table_name"),
            F.array(F.lit("orderkey"), F.lit("status"), F.lit("totalprice")).alias("headers"),
            F.transform(F.col("ordered"), lambda r: r["cells"]).alias("rows"),
            F.lit(None).cast("int").alias("page_number"),
            F.lit(1.0).alias("confidence"),
        )
    )


def extraction_tables_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: nested build -> posexplode -> header-aligned cell access."""
    nested = build_nested_order_tables(spark, sf_dir)
    child = X.explode_extracted_tables(nested, "extraction_id")
    return child.select(
        "extraction_id",
        "table_name",
        "row_index",
        X.cell("orderkey").alias("orderkey_cell"),
        X.cell("status").alias("status_cell"),
        X.cell("totalprice").alias("totalprice_cell"),
    ).orderBy("extraction_id", "row_index")


EXTRACTION_TABLES_EXPLODE_SQL = """
SELECT o_custkey AS extraction_id,
       'orders_' || CAST(o_custkey AS VARCHAR) AS table_name,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT)
         AS row_index,
       CAST(o_orderkey AS VARCHAR) AS orderkey_cell,
       o_orderstatus AS status_cell,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS totalprice_cell
FROM orders
ORDER BY extraction_id, row_index
"""


QUERIES: dict[str, QuerySpec] = {
    "extraction_tables_explode": QuerySpec(
        extraction_tables_explode, EXTRACTION_TABLES_EXPLODE_SQL, ("nested", "explode")
    ),
}
