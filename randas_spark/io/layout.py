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
