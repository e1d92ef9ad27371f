"""Single-pass data profiling: per-column quality stats in long format.

Data-quality gating is the first stage of any large ingestion pipeline;
this computes, for every column, in ONE scan: row count, non-null
count, distinct count, and min/max (rendered as strings so the profile
has one uniform schema regardless of column types).

Plan shape: all per-column aggregates are packed into a single agg()
(Catalyst expands multi-countDistinct into one Expand + two-phase
aggregate — still one pass over the data), producing a 1-row wide
result on the driver side of the plan; an array-of-structs explode then
rotates it long. Nothing about this holds per-row state: at 100 TB the
cost is the scan plus one constant-width shuffle.

For approximate profiling at extreme cardinality swap countDistinct for
approx_count_distinct (HLL, mergeable) — the query layer exposes the
exact version because it is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nonnull, n_distinct,
    min_value, max_value) — one output row per input column."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows__")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    rotated = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n_rows__").alias("n_rows"),
                        F.col(f"{c}__nn").alias("n_nonnull"),
                        F.col(f"{c}__nd").alias("n_distinct"),
                        F.col(f"{c}__mn").alias("min_value"),
                        F.col(f"{c}__mx").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return rotated.select("p.*")
