"""Data-quality audit operators — the dbt-test / Deequ-style checks a
100 TB ingestion pipeline runs before publishing a snapshot: referential
integrity (orphaned foreign keys), key uniqueness, and null-fraction
gates, each expressed as a one-row distributed aggregation so a whole
audit suite unions into one tiny (check, n_violations) table.

Scale notes: every check is a single shuffle at most — the orphan check
is a left-anti equi-join (AQE broadcasts the parent side when small),
uniqueness is a groupBy-count-filter, null checks are scan-side
conditional counts. No collect happens inside the operators; the final
audit table is as many rows as checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_check(child: DataFrame, fk: str, parent: DataFrame, pk: str, name: str) -> DataFrame:
    """One row (check, n_violations): child rows whose non-null ``fk``
    has no matching ``pk`` in parent. Null FKs are not orphans (SQL
    semantics: nothing to reference)."""
    return (
        child.filter(F.col(fk).isNotNull())
        .select(F.col(fk).alias("k"))
        .join(parent.select(F.col(pk).alias("k")).distinct(), "k", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit(name).alias("check"), "n_violations")
    )


def unique_check(df: DataFrame, key: str, name: str) -> DataFrame:
    """One row (check, n_violations): count of key VALUES that appear
    more than once (not the row excess — the number of violated keys).
    NULL keys are excluded, matching SQL UNIQUE semantics (NULLs are
    mutually distinct — pair with not_null_check when nulls themselves
    are the violation)."""
    return (
        df.filter(F.col(key).isNotNull())
        .groupBy(F.col(key))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit(name).alias("check"), "n_violations")
    )


def not_null_check(df: DataFrame, col: str, name: str) -> DataFrame:
    """One row (check, n_violations): null count of ``col``."""
    return df.agg(
        F.count(F.when(F.col(col).isNull(), 1)).alias("n_violations")
    ).select(F.lit(name).alias("check"), "n_violations")


def audit(checks: list[DataFrame]) -> DataFrame:
    """Union one-row check results into the audit table, stable order by
    check name (deterministic output for snapshot diffing)."""
    if not checks:
        raise ValueError("audit: at least one check result is required")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check")
