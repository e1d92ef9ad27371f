"""Table auditing: order-independent content checksums.

Migration validation (the exact job this repo's oracle harness does at
query level) needs a cheap way to assert two copies of a TABLE are
identical without sorting or collecting either: an order-independent
checksum — sum over rows of an md5-derived 32-bit integer of the row's
canonical string form. Sum is commutative/associative, so the result is
partitioning- and order-independent, and md5 is engine-portable, so the
same table checksums identically from Spark, DuckDB, or anything else
(modulo cast-to-string formatting, which is why callers pick the
columns: integers, strings, and timestamps are stable; raw doubles are
not guaranteed).

Scale: one scan + a constant-state aggregation; no shuffle beyond the
single partial-sum merge. Collision odds for "tables differ but sums
agree" are ~2^-32 per independent difference — pair with the row count,
which this emits alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: (n_rows, checksum) — checksum = Σ first-32-bits of
    md5('|'-joined canonical strings of ``cols``), nulls rendered as a
    sentinel so NULL ≠ '' (concat_ws would silently drop them)."""
    canon = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols]
    row_hash = F.conv(
        F.substring(F.md5(F.concat_ws("|", *canon).cast("binary")), 1, 8), 16, 10
    ).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(row_hash).alias("checksum")
    )


def sql_table_checksum(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`table_checksum`."""
    canon = ", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(0) || 'NULL')" for c in cols)
    row_hash = f"(('0x' || substr(md5(concat_ws('|', {canon})), 1, 8))::BIGINT)"
    # CAST: DuckDB sums BIGINT into HUGEINT, which pandas renders float64
    # — the driver's hash then disagrees with Spark's int64 column.
    return (
        f"SELECT count(*) AS n_rows, CAST(sum({row_hash}) AS BIGINT) AS checksum "
        f"FROM {table}"
    )
