"""Readers (reference: /root/reference/src/io/read.rs).

Mapping (SURVEY.md §2.2):

- read_csv    → spark.read.csv with delimiter/encoding/header/inferSchema.
  The reference's rayon 1000-record chunking (read.rs:117) IS Spark's
  input-split parallelism, distributed and memory-bounded instead of
  whole-file-in-RAM (read.rs:96-98).
- read_json   → spark.read.json + recursive struct flatten with
  underscore-joined names and array explode, reproducing flatten_json
  (read.rs:143-184) as plan transformations (select/explode), not row code.
- read_excel  → driver-side pandas.read_excel → createDataFrame (xlsx is
  inherently a small single file; no distributed reader needed).
- read_sql    → sqlite3 driver-side for the reference's SQLite case
  (read.rs:246-290); on a cluster, spark.read.jdbc is the same call shape.
- read_parquet→ the engine's native serialized form (replaces bincode).

All readers return RandasFrame (index discipline applied on ingest).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from randas_spark.frame import RandasFrame


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    encoding: str = "UTF-8",
    header: bool = True,
) -> RandasFrame:
    """CSV with type inference (i64 → f64 → string, empty → null — the
    reference's infer_data_type ladder read.rs:130-140 matches Spark's
    inferSchema). Distributed split-parallel scan."""
    df = (
        spark.read.option("delimiter", delimiter)
        .option("encoding", encoding)
        .option("header", str(header).lower())
        .option("inferSchema", "true")
        .csv(path)
    )
    return RandasFrame(df)


def flatten_struct_df(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten structs into `parent_child` scalar columns and
    explode arrays into extra records — the reference's flatten_json
    semantics (read.rs:143-184: objects recurse with joined keys, arrays
    append one record per element).

    Pure plan rewriting: each level is a select/explode; Catalyst fuses
    the cascade into one projection. Terminates because every pass strictly
    reduces nesting depth.
    """
    while True:
        array_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)
        ]
        if array_cols:
            # explode one array at a time (outer: keep rows with empty
            # arrays); backtick-quote — JSON keys may contain dots
            c = array_cols[0]
            others = [F.col(f"`{n}`") for n in df.columns if n != c]
            df = df.select(*others, F.explode_outer(F.col(f"`{c}`")).alias(c))
            continue
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)
        ]
        if not struct_cols:
            return df
        exprs: list[Any] = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    # backtick-quote both levels: a literal dot in a JSON
                    # key would otherwise parse as field access and fail
                    # analysis (UNRESOLVED_COLUMN)
                    exprs.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(
                            f"{f.name}{sep}{sub.name}"
                        )
                    )
            else:
                exprs.append(F.col(f"`{f.name}`"))
        df = df.select(*exprs)


def read_json(spark: SparkSession, path: str, multiline: bool = True) -> RandasFrame:
    """JSON document(s) → flattened frame (read_json_to_dataframe,
    read.rs:235-244). Nested objects become underscore-joined columns,
    arrays explode into extra records, missing keys null-pad (Spark's
    schema union gives the null-padding for free)."""
    df = spark.read.option("multiLine", str(multiline).lower()).json(path)
    return RandasFrame(flatten_struct_df(df))


def read_excel(
    spark: SparkSession, path: str, sheet: str | None = None
) -> RandasFrame:
    """Excel via the dependency-free stdlib codec (io/xlsx.py — the
    calamine equivalent of read.rs:18-67): first sheet by default, row 1
    = header. Handles shared strings, inline strings, numbers, booleans
    and blank cells; driver-side by design (an xlsx is inherently one
    small file — cluster-scale tabular ingest is the parquet/csv path)."""
    from randas_spark.io.xlsx import read_xlsx

    cols, rows = read_xlsx(path, sheet)
    # pandas-style dedup of repeated headers (x, x.1, x.2 ...) so no
    # column's data is silently collapsed into a dict key collision
    seen: dict[str, int] = {}
    taken: set[str] = set()
    uniq: list[str] = []
    for c in cols:
        cand = c
        if c in seen:
            # keep bumping the suffix until free: headers like
            # ['x', 'x.1', 'x'] must not collide on a literal 'x.1'
            while True:
                seen[c] += 1
                cand = f"{c}.{seen[c]}"
                if cand not in taken:
                    break
        else:
            seen[c] = 0
        taken.add(cand)
        uniq.append(cand)
    data: dict[str, list] = {c: [r[i] for r in rows] for i, c in enumerate(uniq)}
    return RandasFrame.new(spark, data, uniq)


def read_sql(spark: SparkSession, conn, query: str) -> RandasFrame:
    """Run SQL on a DB-API connection (sqlite3 — the reference bundles
    SQLite, read.rs:246-290) and materialize the result set. Cluster-scale
    twin: spark.read.format('jdbc').option('query', ...)."""
    cur = conn.execute(query)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # dedup duplicate result-set names (SELECT x AS a, y AS a) the same
    # way read_excel dedups headers — a plain dict comprehension would
    # silently overwrite the earlier column's data with the later one's
    uniq: list[str] = []
    for c in cols:
        cand, k = c, 1
        while cand in uniq:
            cand = f"{c}.{k}"
            k += 1
        uniq.append(cand)
    data: dict[str, list] = {c: [r[i] for r in rows] for i, c in enumerate(uniq)}
    return RandasFrame.new(spark, data, uniq)


def read_parquet(spark: SparkSession, path: str) -> RandasFrame:
    """Native deserialization (replaces the reference's bincode pickle,
    dataframe.rs:775-781)."""
    return RandasFrame.read_from_file(spark, path)


def read_orc(spark: SparkSession, path: str) -> RandasFrame:
    """ORC (beyond the reference's formats): Spark-native columnar scan
    with the same pushdown/pruning behavior as parquet — the other
    columnar format large ingestion pipelines standardize on."""
    return RandasFrame(spark.read.orc(path))


def read_text(spark: SparkSession, path: str, column: str = "value") -> RandasFrame:
    """Line-delimited text → one string column, one row per line (the
    raw-crawl ingest shape: each line a document/record to parse
    downstream). Split-parallel like csv."""
    df = spark.read.text(path)
    if column != "value":
        df = df.withColumnRenamed("value", column)
    return RandasFrame(df)


def read_arrow_ipc(spark: SparkSession, path: str) -> RandasFrame:
    """Arrow IPC / Feather V2 source (beyond the reference's formats) —
    the zero-copy interchange format ML tooling emits (datasets,
    DataFrame libraries, feature stores).

    DISTRIBUTED read: Spark has no native IPC reader, so the plumbing is
    the canonical per-file decode shape — ``binaryFile`` listing (one
    task per file, whole files are the split unit because IPC files are
    not block-splittable) → ``mapInPandas`` decoding each file with
    pyarrow inside the executor (Arrow-batched, never row-at-a-time).
    The output schema is fixed up front by reading ONE file's schema
    footer driver-side (metadata-only, no data pages) and converting via
    pyspark's own arrow-schema mapping, so Catalyst plans against real
    types and executors just stream batches. At 100 TB the parallelism
    unit is the file — exactly how such exports are laid out."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.ipc as pa_ipc
    from pyspark.sql.pandas.types import from_arrow_schema

    def _is_data_file(name: str) -> bool:
        # skip hidden files and job markers (_SUCCESS, _committed, .crc...)
        return not name.startswith((".", "_"))

    # Schema probe: metadata-only local footer read when the path is a
    # local file/dir; for remote filesystems (s3://, hdfs://...) fall back
    # to pulling the lexicographically-first file through Spark — works on
    # any Hadoop-supported FS at the cost of one file transfer.
    arrow_schema = None
    if "://" not in path and _os.path.exists(path):
        first = path
        if _os.path.isdir(path):
            cands = sorted(
                p
                for p in _glob.glob(_os.path.join(path, "*"))
                if _is_data_file(_os.path.basename(p))
            )
            if not cands:
                raise FileNotFoundError(f"no data files under {path}")
            first = cands[0]
        with open(first, "rb") as f:
            arrow_schema = pa_ipc.open_file(f).schema

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    if arrow_schema is None:
        probe = files.orderBy("path").limit(1).collect()
        if not probe:
            raise FileNotFoundError(f"no data files under {path}")
        arrow_schema = pa_ipc.open_file(pa.BufferReader(bytes(probe[0]["content"]))).schema
    spark_schema = from_arrow_schema(arrow_schema)
    want_names = list(arrow_schema.names)

    def _decode(batches):
        for pdf in batches:
            for fname, blob in zip(pdf["path"], pdf["content"]):
                base = str(fname).rsplit("/", 1)[-1]
                if not _is_data_file(base):
                    continue
                tbl = pa_ipc.open_file(pa.BufferReader(bytes(blob))).read_all()
                # verify + align: match columns BY NAME to the probed
                # schema (a file with a different column order must not be
                # matched positionally); missing/extra names are an error.
                if sorted(tbl.schema.names) != sorted(want_names):
                    raise ValueError(
                        f"arrow_ipc schema mismatch in {base}: "
                        f"{tbl.schema.names} vs probed {want_names}"
                    )
                if list(tbl.schema.names) != want_names:
                    tbl = tbl.select(want_names)
                yield tbl.to_pandas()

    return RandasFrame(files.mapInPandas(_decode, schema=spark_schema))
