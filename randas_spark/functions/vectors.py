"""Vector expression builders for embedding similarity.

Cosine/dot are built from zip_with + a LEFT FOLD (F.aggregate) in array
order, with every element cast float→double first. The DuckDB oracle
(sql_* twins) uses the same index-order left fold (list_reduce), so both
engines execute the identical IEEE-754 op sequence → bit-identical scores,
which makes top-k sets and threshold filters deterministic across engines
with NO rounding slack needed.

Scale: these are whole-stage-codegen'd JVM expressions; a 64-dim cosine is
~200 fused scalar ops per row — no Python, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str) -> str:
    # greatest(len(a), len(b)): Spark's zip_with extends to the LONGER
    # array (extra pair multiplies NULL -> whole fold NULL), so a
    # len(a)-only series would return a finite partial dot on exactly
    # the malformed length-mismatched rows the comparison should flag
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, greatest(len({a}), len({b}))),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),"
        f" (acc, x) -> acc + x)"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)}) / (({sql_norm(a)}) * ({sql_norm(b)}))"
