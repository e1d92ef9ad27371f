"""Table auditing: order-independent content checksums.

Migration validation (the exact job this repo's oracle harness does at
query level) needs a cheap way to assert two copies of a TABLE are
identical without sorting or collecting either: an order-independent
checksum — sum over rows of an md5-derived 32-bit integer of the row's
per-column-digest canonical form. Sum is commutative/associative, so the result is
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
    md5(concat of PER-COLUMN md5 hexes), nulls hashed as a sentinel.

    Per-column hashing (not a '|'-joined string) closes the separator
    injection: rows ('a|b', 'c') and ('a', 'b|c') would canonicalize to
    the same joined string and collide SYSTEMATICALLY, letting differing
    tables validate as identical; fixed-width inner digests make the
    outer hash injective over column boundaries. The sum wraps modulo
    2^64 on BOTH engines (Spark's non-ANSI long sum wraps natively; the
    SQL twin wraps the HUGEINT sum explicitly), so checksums stay
    comparable past the ~2^31 rows where a raw int64 sum of 32-bit
    hashes overflows."""
    canon = [
        F.md5(F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")).cast("binary"))
        for c in cols
    ]
    row_hash = F.conv(
        F.substring(F.md5(F.concat(*canon).cast("binary")), 1, 8), 16, 10
    ).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(row_hash).alias("checksum")
    )


def sql_table_checksum(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`table_checksum` (same per-column digests,
    same explicit mod-2^64 wrap into a signed BIGINT)."""
    canon = " || ".join(
        f"md5(coalesce(CAST({c} AS VARCHAR), chr(0) || 'NULL'))" for c in cols
    )
    row_hash = f"(('0x' || substr(md5({canon}), 1, 8))::BIGINT)"
    # HUGEINT sum wrapped to the signed-64 value Spark's native long
    # wrap produces; CAST so pandas keeps int64 (HUGEINT renders float).
    return (
        f"SELECT count(*) AS n_rows, "
        f"CAST(CASE WHEN (sum({row_hash}) % 18446744073709551616) >= 9223372036854775808 "
        f"THEN (sum({row_hash}) % 18446744073709551616) - 18446744073709551616 "
        f"ELSE (sum({row_hash}) % 18446744073709551616) END AS BIGINT) AS checksum "
        f"FROM {table}"
    )
