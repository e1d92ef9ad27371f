"""Writers (reference: /root/reference/src/io/write.rs).

Mapping (SURVEY.md §2.3):

- to_excel  → driver-side toPandas().to_excel with the reference's cell
  formatting quirks (bool → "TRUE"/"FALSE" strings, datetime →
  "%Y-%m-%d %H:%M:%S", null → blank; write.rs:10-69).
- to_json   → df.write.json (line-delimited records — we adopt the Spark
  orientation; the reference serializes its whole struct, write.rs:72-83,
  a divergence documented in SURVEY.md §2.3).
- to_sql    → DB-API executemany with if_exists append/replace
  (write.rs:86-132: replace = DELETE FROM, table must pre-exist).
- to_csv    → df.write.csv (README.md advertises to_csv but the reference
  never implemented it — README/code drift, SURVEY.md §2.3 NOTE).
- to_parquet→ native serialization (replaces bincode, dataframe.rs:767-772).
"""

from __future__ import annotations

import datetime

from randas_spark.frame import RandasFrame


def to_parquet(frame: RandasFrame, path: str) -> None:
    frame.save_to_file(path)


def to_csv(frame: RandasFrame, path: str, header: bool = True) -> None:
    frame.to_spark().write.mode("overwrite").option("header", str(header).lower()).csv(path)


def to_json(frame: RandasFrame, path: str) -> None:
    frame.to_spark().write.mode("overwrite").json(path)


def to_orc(frame: RandasFrame, path: str) -> None:
    frame.to_spark().write.mode("overwrite").orc(path)


def to_text(frame: RandasFrame, path: str, column: str | None = None) -> None:
    """Line-delimited text sink: exactly one string column (named via
    ``column`` or the frame's single column) becomes one line per row."""
    cols = frame.columns
    name = column or (cols[0] if len(cols) == 1 else None)
    if name is None or name not in cols:
        raise ValueError(
            f"to_text needs a single string column (or column=...); frame has {cols}"
        )
    from pyspark.sql import functions as F

    frame.to_spark().select(F.col(f"`{name}`").cast("string")).write.mode(
        "overwrite"
    ).text(path)


def to_excel(frame: RandasFrame, path: str, sheet: str = "Sheet1") -> None:
    """Driver-side Excel writer (dependency-free io/xlsx.py codec) with
    the reference's formatting quirks applied per cell (write.rs:10-69:
    bool → "TRUE"/"FALSE" strings, datetime → "%Y-%m-%d %H:%M:%S",
    null → blank)."""
    from randas_spark.io.xlsx import write_xlsx

    pdf = frame.to_pandas()
    cols = list(pdf.columns)
    rows = [
        tuple(_excel_cell(v) for v in rec)
        for rec in pdf.itertuples(index=False, name=None)
    ]
    write_xlsx(path, cols, rows, sheet=sheet)


def _excel_cell(v):
    if v is None:
        return ""
    try:
        if v != v:  # float NaN and pd.NaT (a datetime.datetime subclass
            return ""  # whose strftime raises) are null → blank,
            # write.rs:10-69; array cells raise on truthiness — fall through
    except ValueError:
        pass
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"  # write.rs:31-38
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")  # write.rs:51-59
    return v


def to_sql(frame: RandasFrame, table: str, conn, if_exists: str = "append") -> None:
    """Prepared INSERT per row batch; 'replace' clears the pre-existing
    table first (no CREATE TABLE — matching write.rs:86-132)."""
    if if_exists not in ("append", "replace"):
        raise ValueError(f"if_exists must be append|replace, got {if_exists!r}")
    cols = frame.columns
    # frame._ordered() owns the hidden-index invariant — re-spelling
    # "__pos__" here would silently break if the index column changes
    rows = [tuple(r[c] for c in cols) for r in frame._ordered().collect()]
    if if_exists == "replace":
        conn.execute(f"DELETE FROM {table}")
    placeholders = ", ".join("?" for _ in cols)
    conn.executemany(
        f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders})", rows
    )
    conn.commit()


def to_arrow_ipc(frame: RandasFrame, path: str) -> None:
    """Arrow IPC / Feather V2 sink. Driver-side single-file write (the
    same facade shape as to_excel: one portable artifact), via the
    Arrow batches Spark already produces for toPandas. The distributed
    sink for big outputs is parquet/orc (block-splittable, predicate
    pushdown); IPC's niche is interchange, where one file per dataset
    is the contract."""
    import pyarrow as pa
    import pyarrow.ipc as pa_ipc

    # frame.to_pandas() (the __pos__-ordered accessor), NOT
    # to_spark().toPandas(): the latter emits physical partition order,
    # so the single-file artifact would round-trip with a DIFFERENT row
    # order than the frame's logical one
    pdf = frame.to_pandas()
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    with pa_ipc.new_file(path, table.schema) as w:
        w.write_table(table)
