"""RandasFrame — pandas-flavored parity facade over pyspark.sql.DataFrame.

Re-expresses the reference's `DataFrame` surface (SURVEY.md §2; citations are
into /root/reference/src/dataframe/dataframe.rs unless noted) as a thin
wrapper around Spark DataFrames. Everything stays declarative — Catalyst
optimizes the plan; the wrapper only carries the reference's semantics:

- **row-index discipline**: the reference has `index: Vec<String>` row labels
  (dataframe.rs:23-28). Spark DataFrames are unordered multisets, so the
  facade threads two hidden columns: ``__pos__`` (long ordering key) and
  ``__index__`` (string label). Which ops preserve vs reset labels follows
  the reference exactly (query/boolean_index preserve, filter_by_condition
  resets — dataframe.rs:844-884 vs :514-528).
- **numeric-coercion quirks**: aggregates coerce Integer→f64 and silently
  skip String/Boolean/null cells (dataframe.rs:190-197); ``sum`` of nothing
  is 0.0, not NULL (test dataframe.rs:1296-1297).
- **typed query literals**: `query("col == lit")` parses the literal
  i64→f64→String and never matches across types (dataframe.rs:835-852).

Known reference bugs are NOT reproduced (SURVEY.md §7.3d): boolean_index's
mask length is validated against the true row count (reference checks column
count, dataframe.rs:470), as is concat-columns row alignment
(dataframe.rs:721).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

POS = "__pos__"
IDX = "__index__"
_HIDDEN = (POS, IDX)

#: Column types the reference's numeric aggregates coerce (Integer/Float);
#: Boolean/String/DateTime cells are skipped (dataframe.rs:190-197).
_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, _NUMERIC_TYPES)


# --------------------------------------------------------------------------
# query() micro-language parity (dataframe.rs:822-885)
# --------------------------------------------------------------------------


def parse_query(s: str) -> tuple[str, Any]:
    """Parse ``"col == literal"``; literal typed i64 → f64 → String
    (dataframe.rs:835-842). Malformed input raises (the reference panics,
    dataframe.rs:825)."""
    parts = s.split("==")
    if len(parts) != 2:
        raise ValueError(f"malformed query (expected 'col == literal'): {s!r}")
    col = parts[0].strip()
    raw = parts[1].strip()
    lit: Any
    try:
        lit = int(raw)
    except ValueError:
        try:
            lit = float(raw)
        except ValueError:
            lit = raw.strip("'\"")
    return col, lit


def query_predicate(df: DataFrame, s: str) -> Column:
    """Build the reference-typed equality predicate as a Spark Column.

    Typed equality only — an Integer literal never matches a Float column
    and vice versa (dataframe.rs:848-852), and neither matches a String
    column. Cross-type miss compiles to ``lit(False)`` so Catalyst folds
    the scan away entirely.
    """
    col, lit = parse_query(s)
    if col not in df.columns:
        raise KeyError(f"column not found: {col}")
    dtype = df.schema[col].dataType
    integer_col = isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    float_col = isinstance(dtype, (T.FloatType, T.DoubleType))
    string_col = isinstance(dtype, T.StringType)
    if isinstance(lit, bool):  # not produced by parse_query, defensive
        return F.lit(False)
    if isinstance(lit, int):
        return _qc(col) == F.lit(lit) if integer_col else F.lit(False)
    if isinstance(lit, float):
        return _qc(col) == F.lit(lit) if float_col else F.lit(False)
    return _qc(col) == F.lit(lit) if string_col else F.lit(False)


def _qc(name: str) -> Column:
    """Backtick-quoted column reference: a raw name containing a dot
    (read_excel/read_sql dedup to 'x.1') parses as struct-field access
    and fails analysis; quoting makes every accessor dotted-name-safe."""
    return F.col("`" + name.replace("`", "``") + "`")


_MID_RECORD_BITS = 33  # monotonically_increasing_id: partition id in the
# upper 31 bits, record-number-within-partition in the lower 33 (documented
# Spark behavior) — lets us number rows without any global sort.


def _with_ingest_index(sdf: DataFrame) -> DataFrame:
    """Attach ``__pos__``/``__index__`` in ingest order, zipWithIndex-style.

    The naive form — row_number over Window.orderBy(mid) — funnels the
    whole frame through ONE partition to sort. Instead: decompose
    monotonically_increasing_id into (partition, record#), count rows per
    partition (a #partitions-row aggregate), turn counts into cumulative
    start offsets with a window over that tiny result, broadcast-join the
    offsets back, and add. No shuffle of the data itself; same
    assignment as the global window (both order by mid).
    """
    mask = (1 << _MID_RECORD_BITS) - 1
    mid = F.monotonically_increasing_id()
    # checkpoint: the counts branch AND the data branch both read the
    # NONDETERMINISTIC mid — unmaterialized, a nondeterministic upstream
    # (sample, round-robin repartition, task retry) could give the two
    # branches different row-to-partition assignments, yielding
    # duplicate/gapped positions or rows dropped by the offsets join.
    # One materialization per INGEST (facade frames are small by
    # contract); every later op carries the index along.
    tagged = sdf.withColumn("__mid__", mid).localCheckpoint()
    part = F.shiftrightunsigned(F.col("__mid__"), _MID_RECORD_BITS)
    rec = F.col("__mid__").bitwiseAND(F.lit(mask))

    counts = tagged.select(part.alias("__part__")).groupBy("__part__").count()
    w = Window.orderBy("__part__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__part__", F.coalesce(F.sum("count").over(w), F.lit(0)).alias("__off__")
    )
    return (
        tagged.withColumn("__part__", part)
        .join(F.broadcast(offsets), "__part__")
        .withColumn(POS, F.col("__off__") + rec)
        .withColumn(IDX, F.col(POS).cast("string"))
        .drop("__mid__", "__part__", "__off__")
    )


# --------------------------------------------------------------------------
# the facade
# --------------------------------------------------------------------------


class RandasFrame:
    """Thin indexed wrapper over a Spark DataFrame (never an engine)."""

    def __init__(self, sdf: DataFrame):
        """Wrap a Spark DataFrame; generates the index if absent.

        Index generation (SURVEY.md §1.3): ``__pos__`` numbers rows in
        stable ingest order (file/partition order), ``__index__`` is its
        string form — matching the reference's auto index
        ``(0..n).map(to_string)`` (dataframe.rs:45-47). Built
        zipWithIndex-style (see :func:`_with_ingest_index`) — NO global
        single-partition sort, so wrapping a large frame stays scalable.
        """
        if POS not in sdf.columns:
            sdf = _with_ingest_index(sdf)
        self._sdf = sdf

    # -- constructors (dataframe.rs:33-95) --------------------------------

    @classmethod
    def new(
        cls,
        spark: SparkSession,
        data: dict[str, list[Any]],
        columns: Sequence[str] | None = None,
    ) -> "RandasFrame":
        """`DataFrame::new` — columnar map + ordered names; equal-length
        validation (dataframe.rs:33-54)."""
        columns = list(columns) if columns is not None else list(data.keys())
        lengths = {len(v) for v in data.values()}
        if len(lengths) > 1:
            raise ValueError(f"columns have unequal lengths: {lengths}")
        n = lengths.pop() if lengths else 0
        schema = cls._infer_schema(data, columns)
        coerced: dict[str, list[Any]] = {}
        for field in schema:
            vals = data[field.name]
            if isinstance(field.dataType, T.DoubleType):
                coerced[field.name] = [None if v is None else float(v) for v in vals]
            elif isinstance(field.dataType, T.StringType):
                coerced[field.name] = [None if v is None else str(v) for v in vals]
            else:
                coerced[field.name] = list(vals)
        rows = [
            tuple(coerced[c][i] for c in columns) + (i, str(i)) for i in range(n)
        ]
        schema = T.StructType(
            list(schema)
            + [T.StructField(POS, T.LongType(), False), T.StructField(IDX, T.StringType(), False)]
        )
        return cls(spark.createDataFrame(rows, schema))

    @classmethod
    def from_values(
        cls, spark: SparkSession, columns: Sequence[str], values: list[list[Any]]
    ) -> "RandasFrame":
        """`DataFrame::from_values` — row-major rows + names; width
        validation (dataframe.rs:58-95)."""
        for r in values:
            if len(r) != len(columns):
                raise ValueError(f"row width {len(r)} != {len(columns)} columns")
        data = {c: [r[i] for r in values] for i, c in enumerate(columns)}
        return cls.new(spark, data, columns)

    @staticmethod
    def _infer_schema(data: dict[str, list[Any]], columns: Sequence[str]) -> T.StructType:
        """One type per column (SURVEY.md §1.2 decision): widest numeric
        wins; any string → StringType; empty/all-null → StringType."""
        fields = []
        for c in columns:
            vals = [v for v in data[c] if v is not None]
            if not vals:
                dtype: T.DataType = T.StringType()
            elif all(isinstance(v, bool) for v in vals):
                dtype = T.BooleanType()
            elif all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
                dtype = T.LongType()
            elif all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals):
                dtype = T.DoubleType()
            else:
                import datetime

                if all(isinstance(v, datetime.datetime) for v in vals):
                    dtype = T.TimestampType()
                else:
                    dtype = T.StringType()
            fields.append(T.StructField(c, dtype, True))
        return T.StructType(fields)

    # -- plumbing ----------------------------------------------------------

    @property
    def columns(self) -> list[str]:
        return [c for c in self._sdf.columns if c not in _HIDDEN]

    def to_spark(self) -> DataFrame:
        """The underlying Spark DataFrame without the index columns."""
        # backtick-quote: a literal dot in a column name (e.g. the x.1
        # dedup suffix from read_excel) must not parse as field access
        return self._sdf.select(*[F.col(f"`{c}`") for c in self.columns])

    @property
    def sdf(self) -> DataFrame:
        return self._sdf

    def _ordered(self) -> DataFrame:
        return self._sdf.orderBy(POS)

    def _rows(self) -> list:
        return self._ordered().collect()

    def index(self) -> list[str]:
        """`get_index` (dataframe.rs:124-126)."""
        return [r[IDX] for r in self._ordered().select(IDX).collect()]

    # -- projections / access (dataframe.rs:106-182, 379-466) --------------

    def column(self, name: str) -> list[Any] | None:
        """`column` → values in row order, None if absent (dataframe.rs:106).
        Names are backtick-quoted so a literal dot (x.1) is a name, not a
        struct-field path."""
        if name not in self.columns:
            return None
        return [r[name] for r in self._ordered().select(F.col(f"`{name}`")).collect()]

    def collect_column_values(self, name: str) -> list[Any]:
        """`collect_column_values` — missing column raises (dataframe.rs:379)."""
        vals = self.column(name)
        if vals is None:
            raise KeyError(f"column not found: {name}")
        return vals

    def get(self, row: int, col: str) -> Any:
        """`get` — cell by (row position, column name); OOB row → None
        (dataframe.rs:111-121, test :1145-1149)."""
        if col not in self.columns:
            return None
        w = Window.orderBy(POS)
        hit = (
            self._sdf.withColumn("__rk__", F.row_number().over(w) - 1)
            .filter(F.col("__rk__") == row)
            .select(_qc(col).alias(col))
            .collect()
        )
        return hit[0][col] if hit else None

    def get_value(self, row: int, col: str) -> Any:
        """`get_value` — like get, flattening null (dataframe.rs:129-134)."""
        return self.get(row, col)

    def iloc(self, row: int, col: int) -> Any:
        """`iloc` — cell by (row pos, col pos), bounds-checked
        (dataframe.rs:441-466)."""
        cols = self.columns
        if col < 0 or col >= len(cols):
            raise IndexError(f"column position {col} out of bounds")
        n = self.shape()[0]
        if row < 0 or row >= n:
            raise IndexError(f"row position {row} out of bounds")
        return self.get(row, cols[col])

    def loc(self, rows: Sequence[int], cols: Sequence[str] | None = None) -> "RandasFrame":
        """`loc` — positional rows + optional columns; OOB / unknown column
        raises; original index labels kept (dataframe.rs:392-438)."""
        cols_out = list(cols) if cols is not None else self.columns
        for c in cols_out:
            if c not in self.columns:
                raise KeyError(f"column not found: {c}")
        n = self.shape()[0]
        for r in rows:
            if r < 0 or r >= n:
                raise IndexError(f"row position {r} out of bounds")
        w = Window.orderBy(POS)
        out = (
            self._sdf.withColumn("__rk__", F.row_number().over(w) - 1)
            .filter(F.col("__rk__").isin([int(r) for r in rows]))
            .select(*[_qc(c).alias(c) for c in cols_out], POS, IDX)
        )
        return RandasFrame(out)

    def add_column(self, name: str, values: list[Any] | Column) -> "RandasFrame":
        """`add_column` — append or replace; length-checked for literal
        vectors (dataframe.rs:137-165). A Column expression is the scalable
        Spark-native form."""
        if isinstance(values, Column):
            return RandasFrame(self._sdf.withColumn(name, values))
        n = self.shape()[0]
        if len(values) != n:
            raise ValueError(f"column length {len(values)} != row count {n}")
        w = Window.orderBy(POS)
        ranked = self._sdf.withColumn("__rk__", F.row_number().over(w) - 1)
        spark = self._sdf.sparkSession
        # route the literal vector through the SAME inference/coercion as
        # new(): raw createDataFrame crashes on mixed int/float
        # (CANNOT_MERGE_TYPE) or all-None lists that new() handles
        vschema = self._infer_schema({name: list(values)}, [name])
        vfield = vschema[name]
        if isinstance(vfield.dataType, T.DoubleType):
            vals = [None if v is None else float(v) for v in values]
        elif isinstance(vfield.dataType, T.StringType):
            vals = [None if v is None else str(v) for v in values]
        else:
            vals = list(values)
        lut = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)],
            T.StructType(
                [T.StructField("__rk__", T.LongType(), False), vfield]
            ),
        )
        joined = ranked.drop(name).join(F.broadcast(lut), "__rk__", "left").drop("__rk__")
        if name in self.columns:
            # replace keeps the column's ORIGINAL position
            # (dataframe.rs:137-165 replaces in place; drop+join appends)
            joined = joined.select(*self.columns, POS, IDX)
        return RandasFrame(joined)

    def remove_column(self, name: str) -> "RandasFrame":
        """`remove_column` — errors if absent (dataframe.rs:168-182; Spark's
        drop is silent, the parity wrapper raises)."""
        if name not in self.columns:
            raise KeyError(f"column not found: {name}")
        return RandasFrame(self._sdf.drop(name))

    def shape(self) -> tuple[int, int]:
        """`shape` (dataframe.rs:347-351)."""
        return (self._sdf.count(), len(self.columns))

    def extract_numeric_values(self, name: str) -> list[float]:
        """`extract_numeric_values` — numeric-coerced, non-numeric dropped
        (dataframe.rs:748-764)."""
        if name not in self.columns:
            raise KeyError(f"column not found: {name}")
        col = self._numeric_expr(name)
        if col is None:
            return []
        return [
            r["v"]
            for r in self._ordered().select(col.alias("v")).na.drop().collect()
        ]

    # -- filters (dataframe.rs:469-596, 822-885) ----------------------------

    def apply_condition(self, col: str, fn: Callable[[Any], bool]) -> list[bool]:
        """`apply_condition` — closure predicate → bool mask; null → False
        (dataframe.rs:532-550). Driver-side for parity; the scalable path is
        ``filter(Column)`` / a pandas_udf predicate."""
        vals = self.column(col)
        if vals is None:
            raise KeyError(f"column not found: {col}")
        return [False if v is None else bool(fn(v)) for v in vals]

    def filter_by_condition(self, mask: Sequence[bool]) -> "RandasFrame":
        """`filter_by_condition` — keep masked rows, index RESET to 0..k
        (dataframe.rs:514-528)."""
        out = self._mask_filter(mask)
        return RandasFrame(out.drop(POS, IDX))  # re-wrap regenerates index

    def boolean_index(self, mask: Sequence[bool]) -> "RandasFrame":
        """`boolean_index` — masked rows, index labels PRESERVED
        (dataframe.rs:469-511). Mask length validated against the true row
        count (the reference checks column count — bug not reproduced)."""
        n = self.shape()[0]
        if len(mask) != n:
            raise ValueError(f"mask length {len(mask)} != row count {n}")
        return RandasFrame(self._mask_filter(mask))

    def _mask_filter(self, mask: Sequence[bool]) -> DataFrame:
        keep = [i for i, m in enumerate(mask) if m]
        w = Window.orderBy(POS)
        return (
            self._sdf.withColumn("__rk__", F.row_number().over(w) - 1)
            .filter(F.col("__rk__").isin(keep))
            .drop("__rk__")
        )

    def filter(self, predicate: Column) -> "RandasFrame":
        """Spark-native filter; index labels preserved (like boolean_index)."""
        return RandasFrame(self._sdf.filter(predicate))

    def query(self, s: str) -> "RandasFrame":
        """`query("col == lit")` with the reference's literal typing; labels
        preserved (dataframe.rs:822-885). Malformed → raises."""
        return RandasFrame(self._sdf.filter(query_predicate(self._sdf, s)))

    def head(self, n: int = 5) -> "RandasFrame":
        """`head` (dataframe.rs:553-570)."""
        return RandasFrame(self._ordered().limit(n))

    def tail(self, n: int = 5) -> "RandasFrame":
        """`tail` (dataframe.rs:573-596)."""
        w = Window.orderBy(F.col(POS).desc())
        return RandasFrame(
            self._sdf.withColumn("__rk__", F.row_number().over(w))
            .filter(F.col("__rk__") <= n)
            .drop("__rk__")
        )

    # -- aggregates with reference quirks (dataframe.rs:186-368) ------------

    def _numeric_expr(self, name: str) -> Column | None:
        """Numeric coercion per the reference: Integer/Float participate,
        Boolean/String/DateTime cells are skipped (dataframe.rs:190-197).
        Column-typed world: a non-numeric column contributes no cells."""
        dtype = self._sdf.schema[name].dataType
        if _is_numeric(dtype):
            return _qc(name).cast("double")
        if isinstance(dtype, T.StringType):
            # mixed-type parity: numeric-looking strings still skip in the
            # reference (cells are String-tagged) → contribute nothing
            return None
        return None

    def sum(self, name: str) -> float | None:
        """`sum` — non-numeric/empty → 0.0; missing column → None
        (dataframe.rs:186-201)."""
        if name not in self.columns:
            return None
        col = self._numeric_expr(name)
        if col is None:
            return 0.0
        row = self._sdf.agg(F.coalesce(F.sum(col), F.lit(0.0)).alias("v")).collect()[0]
        return float(row["v"])

    def mean(self, name: str) -> float | None:
        """`mean` — None when no numeric cells (dataframe.rs:213-229)."""
        if name not in self.columns:
            return None
        col = self._numeric_expr(name)
        if col is None:
            return None
        row = self._sdf.agg(F.avg(col).alias("v")).collect()[0]
        return None if row["v"] is None else float(row["v"])

    def max(self) -> list[float | None]:
        """`max` — per-column max for ALL columns, non-numeric → None
        (dataframe.rs:232-262)."""
        return self._minmax(F.max)

    def min(self) -> list[float | None]:
        """`min` (dataframe.rs:321-344)."""
        return self._minmax(F.min)

    def _minmax(self, agg) -> list[float | None]:
        exprs, slots = [], []
        for i, c in enumerate(self.columns):
            col = self._numeric_expr(c)
            if col is not None:
                exprs.append(agg(col).alias(f"v{i}"))
                slots.append(i)
        out: list[float | None] = [None] * len(self.columns)
        if exprs:
            row = self._sdf.agg(*exprs).collect()[0]
            for i in slots:
                v = row[f"v{i}"]
                out[i] = None if v is None else float(v)
        return out

    def variance(self, name: str) -> float | None:
        """`variance` — SAMPLE variance (n-1); None if <2 numeric cells
        (dataframe.rs:276-302)."""
        if name not in self.columns:
            return None
        col = self._numeric_expr(name)
        if col is None:
            return None
        row = self._sdf.agg(
            F.var_samp(col).alias("v"), F.count(col).alias("n")
        ).collect()[0]
        if row["n"] < 2 or row["v"] is None:
            return None
        v = float(row["v"])
        return None if math.isnan(v) else v

    def std_dev(self, name: str) -> float | None:
        """`std_dev` = sqrt(sample variance) (dataframe.rs:316-318)."""
        v = self.variance(name)
        return None if v is None else math.sqrt(v)

    def count(self) -> list[int]:
        """`count` — non-null count per column (dataframe.rs:354-368)."""
        row = self._sdf.agg(
            *[F.count(_qc(c)).alias(f"v{i}") for i, c in enumerate(self.columns)]
        ).collect()[0]
        return [int(row[f"v{i}"]) for i in range(len(self.columns))]

    def describe(self) -> "RandasFrame":
        """`describe` — 8 stats over numeric columns with the reference's
        quirks: POPULATION std-dev (divides by n, dataframe.rs:621-626) and
        non-interpolated lower-index quartiles sorted[n/4], [n/2], [3n/4]
        (dataframe.rs:629-635)."""
        stats = ["Count", "Mean", "Std Dev", "Min", "25%", "50%", "75%", "Max"]
        numeric = [c for c in self.columns if self._numeric_expr(c) is not None]
        results: dict[str, list[float | None]] = {}
        for c in numeric:
            col = self._numeric_expr(c)
            vals = self._sdf.select(col.alias("v")).na.drop()
            agg = vals.agg(
                F.count("v").alias("n"),
                F.avg("v").alias("mean"),
                F.stddev_pop("v").alias("std"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            ).collect()[0]
            n = int(agg["n"])
            quart: list[float | None] = [None, None, None]
            if n > 0:
                ordered = vals.orderBy("v")
                for qi, k in enumerate((n // 4, n // 2, 3 * n // 4)):
                    k = min(k, n - 1)
                    quart[qi] = ordered.offset(k).limit(1).collect()[0]["v"]
            results[c] = [
                float(n),
                None if agg["mean"] is None else float(agg["mean"]),
                None if agg["std"] is None else float(agg["std"]),
                None if agg["mn"] is None else float(agg["mn"]),
                quart[0],
                quart[1],
                quart[2],
                None if agg["mx"] is None else float(agg["mx"]),
            ]
        data: dict[str, list[Any]] = {"Statistic": stats}
        for c in numeric:
            data[c] = results[c]
        return RandasFrame.new(self._sdf.sparkSession, data, ["Statistic", *numeric])

    # -- concat (dataframe.rs:671-744) --------------------------------------

    def concat(self, other: "RandasFrame", axis: int = 0) -> "RandasFrame":
        """`concat` — axis 0 rows, axis 1 columns, else error
        (dataframe.rs:671-677)."""
        if axis == 0:
            return self._concat_rows(other)
        if axis == 1:
            return self._concat_columns(other)
        raise ValueError(f"axis must be 0 or 1, got {axis}")

    def _concat_rows(self, other: "RandasFrame") -> "RandasFrame":
        """Vertical union; identical column list required; appended labels
        rewritten '{offset+i}-{orig}' (dataframe.rs:680-717)."""
        if self.columns != other.columns:
            raise ValueError("concat rows requires identical column lists")
        offset = self.shape()[0]
        # POS continues from max(POS)+1, NOT the row count: a left frame
        # that came through tail/filter keeps its original (gapped) POS,
        # so a count-based offset could COLLIDE with surviving positions
        # (nondeterministic interleave) or sort appended rows first. The
        # reference's "{offset}-{label}" rewrite stays count-based.
        row = self._sdf.agg(F.max(POS).alias("m")).collect()[0]
        pos_off = (row["m"] + 1) if row["m"] is not None else 0
        w = Window.orderBy(POS)
        right = (
            other._sdf.withColumn("__rk__", F.row_number().over(w) - 1)
            .withColumn(IDX, F.concat_ws("-", (F.col("__rk__") + offset).cast("string"), F.col(IDX)))
            .withColumn(POS, F.col("__rk__") + pos_off)
            .drop("__rk__")
        )
        cols = [*self.columns, POS, IDX]
        return RandasFrame(self._sdf.select(cols).unionByName(right.select(cols)))

    def _concat_columns(self, other: "RandasFrame") -> "RandasFrame":
        """Horizontal concat — overlapping names rejected; aligned by row
        position (join on position key; broadcast-able); true row-count
        validation (reference's column-count check is a bug)
        (dataframe.rs:720-744)."""
        overlap = set(self.columns) & set(other.columns)
        if overlap:
            raise ValueError(f"overlapping columns: {sorted(overlap)}")
        n1, n2 = self.shape()[0], other.shape()[0]
        if n1 != n2:
            raise ValueError(f"row counts differ: {n1} != {n2}")
        w = Window.orderBy(POS)
        left = self._sdf.withColumn("__rk__", F.row_number().over(w) - 1)
        right = (
            other._sdf.withColumn("__rk__", F.row_number().over(w) - 1)
            .select("__rk__", *other.columns)
        )
        return RandasFrame(left.join(right, "__rk__").drop("__rk__"))

    # -- null handling (dataframe.rs:784-819) -------------------------------

    def dropna(self) -> "RandasFrame":
        """`dropna` — drop rows with any null in any user column
        (dataframe.rs:784-808)."""
        return RandasFrame(self._sdf.na.drop("any", subset=self.columns))

    def fillna(self, name: str, value: Any) -> "RandasFrame":
        """`fillna` — fill nulls in ONE named column (dataframe.rs:811-819)."""
        if name not in self.columns:
            raise KeyError(f"column not found: {name}")
        return RandasFrame(self._sdf.na.fill({name: value}))

    # -- serialization / equality / display (dataframe.rs:767-781, 947-1019) -

    def save_to_file(self, path: str) -> None:
        """`save_to_file` — native serialized form is parquet (the
        reference's bincode pickle, dataframe.rs:767-772)."""
        self._sdf.write.mode("overwrite").parquet(path)

    @classmethod
    def read_from_file(cls, spark: SparkSession, path: str) -> "RandasFrame":
        """`read_from_file` (dataframe.rs:775-781)."""
        return cls(spark.read.parquet(path))

    def equals(self, other: "RandasFrame") -> bool:
        """PartialEq parity: same column list and same data, index not
        compared (dataframe.rs:947-967). Order-insensitive row compare
        (the reference's zip-of-HashMaps equality is flaky by construction —
        we compare sorted row sets)."""
        if self.columns != other.columns:
            return False
        a = sorted(map(str, self.to_spark().collect()))
        b = sorted(map(str, other.to_spark().collect()))
        return a == b

    def __eq__(self, other: object) -> bool:  # pragma: no cover - passthrough
        return isinstance(other, RandasFrame) and self.equals(other)

    def to_string(self) -> str:
        """Display parity: fixed-width 20-char cells, floats '%.2f', nulls
        'NA', positional row number (dataframe.rs:969-1019)."""
        cols = self.columns
        lines = ["".join(f"{c:<20}" for c in ["", *cols])]
        for i, row in enumerate(self._rows()):
            cells = [str(i)]
            for c in cols:
                v = row[c]
                if v is None:
                    cells.append("NA")
                elif isinstance(v, float):
                    cells.append(f"{v:.2f}")
                else:
                    cells.append(str(v))
            lines.append("".join(f"{x:<20}" for x in cells))
        return "\n".join(lines)

    def show(self, n: int = 20) -> None:  # pragma: no cover - console
        self._ordered().select(self.columns).show(n, truncate=False)

    def to_pandas(self):
        return self._ordered().select(self.columns).toPandas()

    def scatter_plot(self, x: str, y: str, path: str) -> None:
        """x-vs-y scatter → PNG (scatter_plot, dataframe.rs:888-944:
        plotters backend, numeric-coerced axes, equal-length assert).

        Driver-side convenience, not a query-engine op (SURVEY.md §2.9):
        numeric extraction is distributed, rendering happens on the
        driver via the dependency-free rasterizer (operators/plot.py over
        the stdlib PNG encoder) — no plotting library needed.
        """
        # ROW-WISE pairing: independent per-column extraction (the
        # reference's own shape, dataframe.rs:905-918) can pass the
        # equal-length check yet plot fabricated (x, y) pairs that never
        # co-occurred when each column drops ITS OWN nulls — we implement
        # the evident intent (pairs from rows where both are numeric)
        # and document the divergence, like the other not-ported bugs.
        xe, ye = self._numeric_expr(x), self._numeric_expr(y)
        if xe is None or ye is None:
            raise ValueError("scatter_plot needs numeric x and y columns")
        rows = (
            self._sdf.select(xe.alias("__x__"), ye.alias("__y__"), POS)
            .filter(F.col("__x__").isNotNull() & F.col("__y__").isNotNull())
            .orderBy(POS)
            .collect()
        )
        xs = [r["__x__"] for r in rows]
        ys = [r["__y__"] for r in rows]
        from randas_spark.operators.plot import render_scatter

        png = render_scatter(xs, ys)  # render BEFORE open: no 0-byte file on error
        with open(path, "wb") as fh:
            fh.write(png)
