"""randas_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the full query surface of the
reference ``Rusty-Gopher/randas`` dataframe library (see SURVEY.md for the
complete operator inventory with ``file:line`` citations into
``/root/reference``), extended with the relational, LLM-data-pipeline and
streaming operators a 100 TB training-data pipeline needs.

Design stance (SURVEY.md §7.0): everything is the DataFrame / Spark SQL API
so Catalyst does all optimization. The pandas-flavored facade
(:class:`randas_spark.frame.RandasFrame`) is a thin wrapper that carries the
reference's semantics (row-index discipline, numeric-coercion quirks, JSON
flattening); it never re-implements execution.
"""

from randas_spark.session import get_spark, load_table, load_tables
from randas_spark.frame import RandasFrame

__version__ = "0.1.0"

__all__ = ["get_spark", "load_table", "load_tables", "RandasFrame", "__version__"]
