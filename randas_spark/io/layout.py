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


def dataset_file_stats(spark: SparkSession, path: str) -> dict:
    """File-level stats for a dataset directory via the Hadoop FileSystem
    API (works on any storage Spark can reach — local, HDFS, object
    stores): data-file count, total bytes, min/max/mean file bytes.
    Checkpoint this before/after maintenance; a mean far below the
    target file size is the small-files problem (per-file open/footer
    overhead and task-scheduling cost dominate the scan at 100 TB)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    sizes = []
    dir_bytes: dict[str, int] = {}
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if f.isFile() and not name.startswith(("_", ".")):
            sizes.append(f.getLen())
            parent = f.getPath().getParent().toString()
            dir_bytes[parent] = dir_bytes.get(parent, 0) + f.getLen()
    total = sum(sizes)
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "min_file_bytes": min(sizes) if sizes else 0,
        "max_file_bytes": max(sizes) if sizes else 0,
        "mean_file_bytes": total // len(sizes) if sizes else 0,
        # per-directory byte map: compact_dataset's slice sizing reads it
        # so partitioned compaction needs no second recursive listing
        "dir_bytes": dir_bytes,
    }


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> dict:
    """Rewrite a dataset into ~``target_file_bytes`` files (the OPTIMIZE /
    small-file compaction of lakehouse engines). Streaming ingest,
    per-batch appends, and fine-grained partitioning all accrete files far
    below the efficient scan size; compaction is the periodic maintenance
    that restores it.

    - Unpartitioned: one ``repartition(ceil(total/target))`` rewrite.
    - Partitioned: the directory tree is preserved (``partitionBy`` on the
      same columns, so pruning keeps working) and rows are re-split on
      (partition cols, hash-slice) where the slice count is sized from the
      LARGEST partition directory — small directories over-split slightly
      rather than any directory exceeding target; per-directory exact
      sizing would need one repartition per directory.

    The rewrite lands in a sibling temp dir, then swaps in via two FS
    renames (original aside, temp in, THEN delete the aside copy) — a
    reader between the renames sees either the old or the new complete
    dataset, and a failed swap leaves the original recoverable at the
    .__compact_old__ path instead of already deleted. Returns
    {files_before, files_after, total_bytes}.
    """
    import math

    from pyspark.sql import functions as F

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)

    before = dataset_file_stats(spark, path)
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"

    if partition_cols:
        # largest partition directory decides the slice count (byte map
        # comes from the SAME listing pass as the before-stats — object
        # stores pay thousands of LIST calls per recursive walk)
        biggest = max(before["dir_bytes"].values(), default=0)
        slices = max(1, math.ceil(biggest / target_file_bytes))
        data_cols = [c for c in df.columns if c not in partition_cols]
        slice_col = F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), F.lit(slices))
        (
            df.repartition(*partition_cols, slice_col)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .format(fmt)
            .save(tmp)
        )
    else:
        n = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
        df.repartition(n).write.mode("overwrite").format(fmt).save(tmp)

    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    aside = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__compact_old__")
    if fs.exists(aside):
        fs.delete(aside, True)
    if not fs.rename(jpath, aside):
        raise IOError(f"compact_dataset: could not move {path} aside")
    if not fs.rename(jtmp, jpath):
        # roll back: restore the original before raising
        fs.rename(aside, jpath)
        raise IOError(f"compact_dataset: could not swap in {tmp}; original restored")
    fs.delete(aside, True)
    after = dataset_file_stats(spark, path)
    return {
        "files_before": before["n_files"],
        "files_after": after["n_files"],
        "total_bytes": after["total_bytes"],
    }


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
    # ONE multi-column approxQuantile job: a per-column call would scan
    # the whole dataset once PER DIMENSION (len(cols) full scans at the
    # 100 TB target for work one pass computes)
    dts = dict(df.dtypes)
    probe_cols = [
        (F.col(c).cast("long") if dts[c] == "timestamp" else F.col(c))
        .cast("double")
        .alias(c)
        for c in cols
    ]
    all_edges = df.select(*probe_cols).approxQuantile(cols, qs, 0.01)
    bucketed = []
    for c, edges in zip(cols, all_edges):
        col = F.col(c)
        if dts[c] == "timestamp":
            col = col.cast("long")
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
