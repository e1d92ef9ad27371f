"""IO matrix (SURVEY.md §2.2-2.3): readers and writers re-expressing the
reference's io surface (/root/reference/src/io/{read,write}.rs) on Spark
sources/sinks."""

from randas_spark.io.read import (
    read_csv,
    read_excel,
    read_json,
    read_parquet,
    read_sql,
)
from randas_spark.io.write import to_csv, to_excel, to_json, to_parquet, to_sql

__all__ = [
    "read_csv",
    "read_excel",
    "read_json",
    "read_parquet",
    "read_sql",
    "to_csv",
    "to_excel",
    "to_json",
    "to_parquet",
    "to_sql",
]
