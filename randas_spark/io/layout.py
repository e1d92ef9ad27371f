"""Physical data layout: partitioned writes and bucketed tables.

The reference has no partitioning concept (SURVEY.md §4.1 — single
in-memory table, bincode persistence); at the 100 TB target layout is the
difference between scanning terabytes and scanning megabytes:

- **Hive-style partition columns** (`write_partitioned`) turn equality /
  range predicates on the partition key into directory pruning — the scan
  never opens non-matching files (static pruning at plan time, dynamic
  partition pruning for join-derived predicates).
- **Bucketing** (`write_bucketed`) pre-shuffles a table ONCE at write
  time into N hash buckets on the join/agg key. Two tables bucketed the
  same way join with ZERO runtime exchange — the classic fix for the
  repeated lineitem⋈orders shuffle, paid once instead of per-query.

Both are thin wrappers over the native writers, kept separate from
io.write (which mirrors the reference's sinks) because they are
engine-scale features with no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Write with hive-style partition directories (`col=value/...`).

    Pick partition columns with bounded cardinality (date, region — not a
    key): each distinct value is a directory, and tiny partitions create
    the small-files problem. Combine with AQE coalescing or an explicit
    `df.repartition(*partition_cols)` before writing so each partition
    directory gets few, large files.
    """
    (
        df.repartition(*partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins/aggregations keyed on `bucket_cols` between tables with the
    same bucket spec run shuffle-free (verify: no Exchange in the plan);
    sorted buckets additionally let sort-merge join skip its sort step.
    `num_buckets` should divide evenly into cluster parallelism at the
    target scale (e.g. 4096 buckets for a 1000-executor cluster).
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_pruned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a partitioned dataset; partition-key filters applied by the
    caller prune directories before any file I/O (check
    `.explain` → PartitionFilters)."""
    return spark.read.format(fmt).load(path)


def zorder_key(df: DataFrame, cols: list[str], bits_per_dim: int = 8) -> "Column":
    """Morton (Z-order) key over 2+ numeric/timestamp columns.

    Each column is rank-bucketed into 2^bits_per_dim quantile buckets
    (edges from approxQuantile on a sample — skew-robust, unlike linear
    min/max scaling), then the bucket bits are interleaved. Sorting by
    the interleaved key clusters rows so that EVERY keyed column's
    min/max footer stats are tight per file — a range predicate on ANY
    of the dimensions skips most files, where a plain sort gives tight
    stats on the leading column only. The whole expression is built-in
    bit arithmetic (codegen, no UDF); the only driver-side step is the
    one-time quantile sample.
    """
    from pyspark.sql import functions as F

    n_buckets = 1 << bits_per_dim
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bucketed = []
    for c in cols:
        col = F.col(c)
        dt = dict(df.dtypes)[c]
        if dt == "timestamp":
            col = col.cast("long")
            probe = df.select(col.alias(c))
        else:
            probe = df.select(F.col(c).cast("double").alias(c))
        edges = probe.approxQuantile(c, qs, 0.01)
        # strictly-increasing edge list (duplicate quantiles collapse)
        uniq: list[float] = []
        for e in edges:
            if not uniq or e > uniq[-1]:
                uniq.append(e)
        arr = F.lit(uniq) if uniq else F.array().cast("array<double>")
        # bucket = #edges <= value (array filter: codegen, no shuffle)
        bucketed.append(
            F.size(F.filter(arr, lambda e: e <= col.cast("double"))).cast("long")
        )
    # interleave: bit i of dim d lands at position i*ndims + d
    ndims = len(cols)
    z = F.lit(0).cast("long")
    for d, b in enumerate(bucketed):
        for i in range(bits_per_dim):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ndims + d)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 32,
    bits_per_dim: int = 8,
) -> None:
    """Write parquet clustered on a Z-order curve over ``zorder_cols``.

    The multi-dimensional cousin of ``write_bucketed``: range-partition
    by the Morton key (num_files contiguous curve segments → that many
    files), sort within partitions, write. Afterwards parquet footer
    min/max stats are tight on every keyed column, so Catalyst's
    pushed-down range filters skip non-overlapping files/row-groups on
    any dimension — at 100 TB, the difference between scanning the
    dataset and scanning the handful of files a (user, time-range) probe
    actually touches. The curve segments are computed with one extra
    column and a range shuffle — same cost shape as a plain global sort.
    """
    z = zorder_key(df, zorder_cols, bits_per_dim)
    (
        df.withColumn("__z__", z)
        .repartitionByRange(num_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )
