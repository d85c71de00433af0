"""car_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
platform (joshrkay/CAR-ETL, surveyed in /root/repo/SURVEY.md) as idiomatic
Spark DataFrame / SQL dataflow, designed for 100 TB scale:

- ``functions/``  — pure Column-expression libraries (normalizers, text,
  vectors) that stay inside Catalyst whole-stage codegen.
- ``operators/``  — composed dataflow operators (rollups, search, dedup,
  versioning, entity resolution).
- ``queries/``    — the oracle-checked query registry consumed by
  ``__spark_entry__.py`` (driver contract).
- ``streaming/``  — Structured Streaming equivalents of the reference's
  hand-rolled queue/worker semantics.
"""

__version__ = "0.1.0"

from car_etl_spark.session import get_spark  # noqa: F401
from car_etl_spark.tables import TABLES, load_tables  # noqa: F401
