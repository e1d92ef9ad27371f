"""Distributed global ranking — row_number over a TOTAL order without
the single-task funnel.

A bare ``row_number() OVER (ORDER BY ...)`` (no PARTITION BY) collapses
the whole dataset into ONE window task — the classic scale cliff hiding
in otherwise-fine plans. The alternative here is the machinery a global
orderBy already uses, kept parallel end-to-end:

1. ``repartitionByRange`` on the sort key — sampled range boundaries
   put partition i strictly before partition i+1 in the total order;
2. per-partition ``row_number`` (parallel, each task ranks only its
   slice);
3. one 32-row per-partition count table, cumulative-summed on the
   driver-scale side and BROADCAST back as offsets.

Identical ranks to the funnel formulation, no task ever sees more than
its range slice. First used inline by llm_shard_balance (queries/
llm.py); extracted here because the pattern generalizes — percentile
assignment (rel_global_percentile), deterministic ID issuance,
pagination. The reference engine (dataframe.rs) has no ranking at all;
this is the beyond-reference scale path for any global-order need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_global_rank(
    df: DataFrame,
    order: list[Column],
    n_parts: int = 32,
    out_col: str = "rn",
) -> DataFrame:
    """Add a 0-based global row number ``out_col`` under the total order
    ``order`` (which must be deterministic — include a tiebreak key).

    Scale: no single-task window. Range-repartition on the sort key,
    rank within each partition in parallel, then add broadcast
    cumulative offsets from the ``n_parts``-row count table. On a real
    cluster set ``n_parts`` ≈ 2-3x total cores (the same sizing as any
    shuffle).
    """
    parts = df.repartitionByRange(n_parts, *order).sortWithinPartitions(*order)
    local = parts.withColumn("__pid__", F.spark_partition_id()).withColumn(
        "__lrk__",
        F.row_number().over(Window.partitionBy("__pid__").orderBy(*order)) - 1,
    )
    offsets = (
        local.groupBy("__pid__")
        .agg(F.count(F.lit(1)).alias("__c__"))
        .withColumn(
            "__off__",
            F.coalesce(
                F.sum("__c__").over(
                    Window.orderBy("__pid__").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid__", "__off__")
    )
    return (
        local.join(F.broadcast(offsets), "__pid__")
        .withColumn(out_col, (F.col("__off__") + F.col("__lrk__")).cast("long"))
        .drop("__pid__", "__lrk__", "__off__")
    )


def distributed_prefix_max(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    out_col: str = "prior_max",
    n_parts: int = 32,
) -> DataFrame:
    """Add ``out_col`` = max of ``value_col`` over all STRICTLY earlier
    rows under the total order ``order`` (NULL for the first row) — a
    distributed prefix scan, the same offsets trick as
    :func:`distributed_global_rank` generalized from count to any
    associative/commutative prefix aggregate:

    1. range-repartition on the order key;
    2. per-partition running max over earlier LOCAL rows (parallel);
    3. an ``n_parts``-row per-partition max table, cumulative over
       prior partitions and BROADCAST back;
    4. row result = greatest(local prior, prior partitions' max).

    A bare ``max() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` puts
    the whole dataset through one window task; this never does. The
    motivating use is the watermark-lateness audit (an event's lateness
    is how far the arrival-time high-water mark had already passed its
    event time), but any running high-water/record-to-date computation
    fits.
    """
    parts = df.repartitionByRange(n_parts, *order).sortWithinPartitions(*order)
    local = parts.withColumn("__pid__", F.spark_partition_id()).withColumn(
        "__lpm__",
        F.max(value_col).over(
            Window.partitionBy("__pid__")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    pstats = (
        local.groupBy("__pid__")
        .agg(F.max(value_col).alias("__pmx__"))
        .withColumn(
            "__prior__",
            F.max("__pmx__").over(
                Window.orderBy("__pid__").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("__pid__", "__prior__")
    )
    return (
        local.join(F.broadcast(pstats), "__pid__")
        # greatest() skips NULLs, so the first rows of the first
        # partition (no local prior, no prior partition) stay NULL
        .withColumn(out_col, F.greatest("__lpm__", "__prior__"))
        .drop("__pid__", "__lpm__", "__prior__")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    out_col: str = "prior_sum",
    n_parts: int = 32,
) -> DataFrame:
    """Add ``out_col`` = sum of ``value_col`` over all STRICTLY earlier
    rows under the total order ``order`` (0 for the first row) — the
    EXCLUSIVE prefix sum on the same two-narrow-shuffles +
    broadcast-offsets plan as :func:`distributed_prefix_max`. A bare
    ``sum() OVER (ORDER BY ...)`` is the single-task funnel this
    module exists to kill.

    Integer discipline: callers pass integer value columns (token
    counts, byte sizes) so the scan is exact and order-free; the
    motivating use is sequence packing (operators/corpus.sequence_pack),
    where a doc's global token offset is exactly this prefix sum.
    """
    parts = df.repartitionByRange(n_parts, *order).sortWithinPartitions(*order)
    local = parts.withColumn("__pid__", F.spark_partition_id()).withColumn(
        "__lps__",
        F.sum(value_col).over(
            Window.partitionBy("__pid__")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    pstats = (
        local.groupBy("__pid__")
        .agg(F.sum(value_col).alias("__psm__"))
        .withColumn(
            "__prior__",
            F.sum("__psm__").over(
                Window.orderBy("__pid__").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("__pid__", "__prior__")
    )
    return (
        local.join(F.broadcast(pstats), "__pid__")
        .withColumn(
            out_col,
            (
                F.coalesce(F.col("__lps__"), F.lit(0))
                + F.coalesce(F.col("__prior__"), F.lit(0))
            ).cast("long"),
        )
        .drop("__pid__", "__lps__", "__prior__")
    )
