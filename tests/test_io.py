"""I/O matrix round-trip tests (SURVEY.md §7.2 M2), mirroring the
reference's read/write test style (read.rs:292-428, write.rs:134-309):
write → read back → compare, error paths, in-memory SQLite per test.
"""

from __future__ import annotations

import datetime
import json
import os
import sqlite3

import pytest


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def _values(frame):
    """Row-major values in index order, visible columns only."""
    cols = frame.columns
    return [tuple(r[c] for c in cols) for r in frame.sdf.orderBy("__pos__").collect()]


def test_csv_round_trip(spark, people, tmp):
    from randas_spark.io.read import read_csv
    from randas_spark.io.write import to_csv

    path = os.path.join(tmp, "people_csv")
    to_csv(people, path)
    back = read_csv(spark, path)
    assert back.columns == people.columns
    assert sorted(_values(back)) == sorted(_values(people))
    # inferSchema reproduces the reference's i64→f64→string ladder
    dtypes = dict(back.to_spark().dtypes)
    assert dtypes["ID"] in ("int", "bigint")
    assert dtypes["Score"] == "double"
    assert dtypes["Name"] == "string"


def test_csv_delimiter_and_null(spark, tmp):
    from randas_spark.io.read import read_csv

    path = os.path.join(tmp, "semi.csv")
    with open(path, "w") as f:
        f.write("a;b;c\n1;;x\n2;3.5;y\n")
    back = read_csv(spark, path, delimiter=";")
    rows = sorted(_values(back))
    # empty field → null (read.rs:131-132)
    assert rows == [(1, None, "x"), (2, 3.5, "y")]


def test_json_flatten_nested_object_and_array(spark, tmp):
    """The reference's flatten_json semantics (read.rs:143-184): nested
    objects → underscore-joined columns, arrays → one record per element
    (verified against its examples/sample.json fixture shape)."""
    from randas_spark.io.read import read_json

    doc = {
        "name": "John",
        "age": 30,
        "address": {"city": "Springfield", "zip": "12345"},
        "phoneNumbers": [
            {"type": "home", "number": "555-1234"},
            {"type": "work", "number": "555-5678"},
        ],
    }
    path = os.path.join(tmp, "sample.json")
    with open(path, "w") as f:
        json.dump(doc, f)
    back = read_json(spark, path)
    assert set(back.columns) >= {
        "name",
        "age",
        "address_city",
        "address_zip",
        "phoneNumbers_type",
        "phoneNumbers_number",
    }
    rows = back.to_spark().collect()
    assert len(rows) == 2  # array exploded into one record per element
    assert {r["phoneNumbers_type"] for r in rows} == {"home", "work"}
    assert all(r["address_city"] == "Springfield" for r in rows)


def test_json_write_round_trip(spark, people, tmp):
    from randas_spark.io.read import read_json
    from randas_spark.io.write import to_json

    path = os.path.join(tmp, "people_json")
    to_json(people, path)
    back = read_json(spark, path, multiline=False)
    assert sorted(back.columns) == sorted(people.columns)
    got = {tuple(r[c] for c in sorted(back.columns)) for r in back.to_spark().collect()}
    want = {
        tuple(r[c] for c in sorted(people.columns))
        for r in people.to_spark().collect()
    }
    assert got == want


def test_parquet_round_trip(spark, people, tmp):
    """Native serialization (replaces the reference's bincode pickle,
    dataframe.rs:1556-1590 round-trip test)."""
    from randas_spark.io.read import read_parquet
    from randas_spark.io.write import to_parquet

    path = os.path.join(tmp, "people_parquet")
    to_parquet(people, path)
    back = read_parquet(spark, path)
    assert back.columns == people.columns
    assert _values(back) == _values(people)
    assert back.index() == people.index()  # index survives the round trip


def test_sql_round_trip_append_and_replace(spark, people):
    """to_sql → read_sql against in-memory SQLite (write.rs:279-308 /
    read.rs:372-387 pattern: table pre-exists, replace = DELETE FROM)."""
    from randas_spark.io.read import read_sql
    from randas_spark.io.write import to_sql

    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE people (ID INTEGER, Name TEXT, Score REAL)")
    to_sql(people, "people", conn, if_exists="append")
    to_sql(people, "people", conn, if_exists="append")
    assert conn.execute("SELECT count(*) FROM people").fetchone()[0] == 6
    to_sql(people, "people", conn, if_exists="replace")
    back = read_sql(spark, conn, "SELECT * FROM people ORDER BY ID")
    assert back.columns == ["ID", "Name", "Score"]
    assert _values(back) == _values(people)


def test_sql_bad_if_exists_raises(people):
    from randas_spark.io.write import to_sql

    with pytest.raises(ValueError):
        to_sql(people, "t", None, if_exists="upsert")


def test_excel_round_trip_or_gated(spark, people, tmp):
    """Excel path: full round-trip through the dependency-free stdlib
    codec (io/xlsx.py) — no engine gate since r4."""
    from randas_spark.io.read import read_excel
    from randas_spark.io.write import to_excel

    path = os.path.join(tmp, "people.xlsx")
    to_excel(people, path)
    back = read_excel(spark, path)
    assert back.columns == people.columns
    assert sorted(_values(back)) == sorted(_values(people))


def test_xlsx_codec_cell_types_and_blanks(tmp):
    """Codec-level: numbers/bools/strings/None round-trip with correct
    Python types; blank cells read as None; shared-string files (the
    form Excel itself writes) parse too."""
    import zipfile

    from randas_spark.io.xlsx import col_letters, read_xlsx, write_xlsx

    assert [col_letters(i) for i in (0, 25, 26, 701, 702)] == ["A", "Z", "AA", "ZZ", "AAA"]

    path = os.path.join(tmp, "t.xlsx")
    write_xlsx(
        path,
        ["id", "name", "score", "ok"],
        [(1, "ann", 9.5, True), (2, None, -3, False), (3, "x <&> y", 0.25, True)],
    )
    cols, rows = read_xlsx(path)
    assert cols == ["id", "name", "score", "ok"]
    assert rows[0] == [1, "ann", 9.5, True]
    assert rows[1] == [2, None, -3, False]
    assert rows[2] == [3, "x <&> y", 0.25, True]

    # shared-strings variant (what Excel/openpyxl write for string cells)
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sst_path = os.path.join(tmp, "sst.xlsx")
    with zipfile.ZipFile(path) as src, zipfile.ZipFile(sst_path, "w") as dst:
        for item in src.namelist():
            if item != "xl/worksheets/sheet1.xml":
                dst.writestr(item, src.read(item))
        dst.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst {ns}><si><t>hdr</t></si><si><t>val</t></si></sst>',
        )
        dst.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    cols2, rows2 = read_xlsx(sst_path)
    assert cols2 == ["hdr"] and rows2 == [["val"]]


def test_xlsx_edge_cases(spark, tmp):
    """Review-driven regressions: all-null rows keep their position,
    NaN writes as blank (null quirk), quoted sheet names stay
    well-formed, duplicate headers dedup pandas-style instead of
    silently collapsing a column."""
    import math

    from randas_spark.frame import RandasFrame
    from randas_spark.io.read import read_excel
    from randas_spark.io.write import to_excel
    from randas_spark.io.xlsx import read_xlsx, write_xlsx

    # all-null row survives with its position
    p1 = os.path.join(tmp, "nullrow.xlsx")
    write_xlsx(p1, ["a", "b"], [(None, None), (2, 3)])
    _, rows = read_xlsx(p1)
    assert rows == [[None, None], [2, 3]]

    # NaN → blank cell, and a quoted sheet name round-trips
    f = RandasFrame.new(spark, {"x": [1.5, float("nan")]}, ["x"])
    p2 = os.path.join(tmp, "nan.xlsx")
    to_excel(f, p2, sheet='Q1 "final"')
    cols, rows = read_xlsx(p2, sheet='Q1 "final"')
    assert cols == ["x"]
    assert rows == [[1.5], [None]]
    assert not any(
        isinstance(v, float) and math.isnan(v) for r in rows for v in r
    )

    # XML-invalid chars and literal _xHHHH_ sequences survive via the
    # ECMA-376 ST_Xstring escaping
    p_esc = os.path.join(tmp, "esc.xlsx")
    tricky = ["a\x00b", "nonchar:￾", "lit:_x0041_", "\x1b[31mansi"]
    write_xlsx(p_esc, ["s"], [(v,) for v in tricky])
    _, esc_rows = read_xlsx(p_esc)
    assert [r[0] for r in esc_rows] == tricky

    # duplicate headers: both columns' data preserved under x / x.1
    p3 = os.path.join(tmp, "dup.xlsx")
    write_xlsx(p3, ["x", "x"], [(1, 10), (2, 20)])
    back = read_excel(spark, p3)
    assert back.columns == ["x", "x.1"]
    got = {tuple(r) for r in zip(back.collect_column_values("x"),
                                 back.collect_column_values("x.1"))}
    assert got == {(1, 10), (2, 20)}


def test_xlsx_advice_regressions(spark, tmp):
    """Round-5 review regressions: \\r escapes as _x000D_ (XML 1.0
    normalization would eat it), NaT datetime cells write as blank,
    colliding header dedup ('x','x.1','x') stays injective, and cells
    whose <c> lacks the optional r attribute keep their implied
    position."""
    import zipfile

    from randas_spark.frame import RandasFrame
    from randas_spark.io.read import read_excel
    from randas_spark.io.write import to_excel
    from randas_spark.io.xlsx import read_xlsx, write_xlsx

    # \r round-trips (encoded as _x000D_ per ECMA-376 ST_Xstring)
    p = os.path.join(tmp, "cr.xlsx")
    write_xlsx(p, ["s"], [("a\rb",), ("\r",), ("a\r\nb",)])
    _, rows = read_xlsx(p)
    assert [r[0] for r in rows] == ["a\rb", "\r", "a\r\nb"]
    with zipfile.ZipFile(p) as z:
        assert b"_x000D_" in z.read("xl/worksheets/sheet1.xml")

    # nullable timestamp: NaT must write as blank, not crash strftime
    f = RandasFrame.new(
        spark,
        {"ts": [datetime.datetime(2024, 1, 2, 3, 4, 5), None], "x": [1, 2]},
        ["ts", "x"],
    )
    p2 = os.path.join(tmp, "nat.xlsx")
    to_excel(f, p2)
    cols, rows2 = read_xlsx(p2)
    assert cols == ["ts", "x"]
    by_x = {r[1]: r[0] for r in rows2}
    assert by_x[1] == "2024-01-02 03:04:05"
    assert by_x[2] is None

    # header dedup collision: ['x', 'x.1', 'x'] → injective names
    p3 = os.path.join(tmp, "collide.xlsx")
    write_xlsx(p3, ["x", "x.1", "x"], [(1, 2, 3)])
    back = read_excel(spark, p3)
    assert back.columns == ["x", "x.1", "x.2"]
    assert [back.collect_column_values(c)[0] for c in back.columns] == [1, 2, 3]

    # cells without r attributes: implied positions, no silent drops
    p4 = os.path.join(tmp, "noref.xlsx")
    write_xlsx(p4, ["a", "b"], [(1, 2)])
    with zipfile.ZipFile(p4) as z:
        names = z.namelist()
        parts = {n: z.read(n) for n in names}
    import re as _re

    sheet = parts["xl/worksheets/sheet1.xml"].decode()
    stripped = _re.sub(r' r="[A-Z]+\d+"', "", _re.sub(r' r="\d+"', "", sheet))
    assert ' r="' not in stripped
    parts["xl/worksheets/sheet1.xml"] = stripped.encode()
    with zipfile.ZipFile(p4, "w") as z:
        for n, data in parts.items():
            z.writestr(n, data)
    cols4, rows4 = read_xlsx(p4)
    assert cols4 == ["a", "b"]
    assert rows4 == [[1, 2]]


def test_orc_round_trip(spark, people, tmp):
    """ORC sink/source: full-fidelity columnar round trip (same pushdown
    family as parquet)."""
    from randas_spark.io.read import read_orc
    from randas_spark.io.write import to_orc

    path = os.path.join(tmp, "people_orc")
    to_orc(people, path)
    back = read_orc(spark, path)
    assert sorted(back.columns) == sorted(people.columns)
    assert sorted(_values(back)) == sorted(_values(people))


def test_arrow_ipc_round_trip_and_multifile(spark, people, tmp):
    """Arrow IPC sink/source: single-file round trip with type fidelity
    (ints/floats/strings/timestamps/nulls), then a DIRECTORY of two IPC
    files reads as their union through the distributed per-file decode."""
    import datetime as dt

    from randas_spark.frame import RandasFrame
    from randas_spark.io.read import read_arrow_ipc
    from randas_spark.io.write import to_arrow_ipc

    path = os.path.join(tmp, "people.arrow")
    to_arrow_ipc(people, path)
    back = read_arrow_ipc(spark, path)
    assert sorted(back.columns) == sorted(people.columns)
    assert sorted(_values(back)) == sorted(_values(people))

    typed = RandasFrame(
        spark.createDataFrame(
            [(1, 1.5, "a", dt.datetime(2024, 1, 1), True), (2, None, None, None, None)],
            "i bigint, f double, s string, ts timestamp, b boolean",
        )
    )
    tpath = os.path.join(tmp, "typed.arrow")
    to_arrow_ipc(typed, tpath)
    tback = read_arrow_ipc(spark, tpath)
    assert tback.to_spark().schema == typed.to_spark().schema
    assert sorted(_values(tback), key=str) == sorted(_values(typed), key=str)

    d = os.path.join(tmp, "ipc_dir")
    os.makedirs(d)
    to_arrow_ipc(people, os.path.join(d, "part0.arrow"))
    to_arrow_ipc(people, os.path.join(d, "part1.arrow"))
    both = read_arrow_ipc(spark, d)
    assert both.to_spark().count() == 2 * people.to_spark().count()


def test_arrow_ipc_empty_dir_raises(spark, tmp):
    from randas_spark.io.read import read_arrow_ipc

    d = os.path.join(tmp, "empty_ipc")
    os.makedirs(d)
    with pytest.raises(FileNotFoundError):
        read_arrow_ipc(spark, d)


def test_text_round_trip_and_column_rules(spark, tmp):
    """Line-text sink/source: one line per row, rename on read, and the
    multi-column frame needs an explicit column choice."""
    import pytest as _pytest

    from randas_spark.frame import RandasFrame
    from randas_spark.io.read import read_text
    from randas_spark.io.write import to_text

    f = RandasFrame.new(spark, {"line": ["alpha", "beta", "gamma"]}, ["line"])
    path = os.path.join(tmp, "lines_txt")
    to_text(f, path)
    back = read_text(spark, path, column="line")
    assert back.columns == ["line"]
    assert sorted(back.collect_column_values("line")) == ["alpha", "beta", "gamma"]

    multi = RandasFrame.new(spark, {"a": ["x"], "b": ["y"]}, ["a", "b"])
    with _pytest.raises(ValueError):
        to_text(multi, os.path.join(tmp, "nope_txt"))
    to_text(multi, os.path.join(tmp, "b_txt"), column="b")
    assert read_text(spark, os.path.join(tmp, "b_txt")).collect_column_values("value") == ["y"]


def test_text_reads_gzip_transparently(spark, tmp):
    """Raw-crawl ingestion reality: line-text (and csv/json) sources are
    usually gzipped; Spark's codec discovery must decompress by
    extension with no reader changes. (Note for 100 TB: .gz is NOT
    block-splittable — one task per file — so crawls should arrive as
    many moderate files; that operational caveat is the point of
    pinning this.)"""
    import gzip

    from randas_spark.io.read import read_text

    d = os.path.join(tmp, "gz_text")
    os.makedirs(d)
    lines = ["alpha", "beta", "gamma", "delta"]
    with gzip.open(os.path.join(d, "part0.txt.gz"), "wt") as f:
        f.write("\n".join(lines[:2]) + "\n")
    with gzip.open(os.path.join(d, "part1.txt.gz"), "wt") as f:
        f.write("\n".join(lines[2:]) + "\n")
    back = read_text(spark, d, column="line")
    assert sorted(r.line for r in back.to_spark().collect()) == sorted(lines)


def test_read_csv_missing_file_raises(spark):
    from pyspark.errors import AnalysisException

    from randas_spark.io.read import read_csv

    with pytest.raises(AnalysisException):
        read_csv(spark, "/nonexistent/nowhere.csv").to_spark().collect()


def test_parquet_schema_evolution_merge(spark, tmp):
    """Schema evolution across parquet batches: a later batch adds a
    column; mergeSchema reads the union schema with nulls backfilled —
    the append-only ingestion reality at 100 TB (schemas drift; readers
    must not require a rewrite of old data)."""
    import os

    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v2 = spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    )
    path = os.path.join(tmp, "evolving")
    v1.write.parquet(path)
    v2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 0.5)}


def test_table_checksum_invariant_and_sensitive(spark):
    """Checksum identical under repartition; changes when any row
    changes; null sentinel distinguishes NULL from empty string."""
    from randas_spark.io.audit import table_checksum

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    base = table_checksum(df, ["k", "v"]).first()
    shuffled = table_checksum(df.repartition(7), ["k", "v"]).first()
    assert (base.n_rows, base.checksum) == (shuffled.n_rows, shuffled.checksum)

    changed = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None)], "k long, v string"
    )
    assert table_checksum(changed, ["k", "v"]).first().checksum != base.checksum

    empty_str = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "")], "k long, v string"
    )
    assert table_checksum(empty_str, ["k", "v"]).first().checksum != base.checksum


def test_arrow_ipc_markers_and_column_order(spark, people, tmp):
    """A job-marker file (_SUCCESS) sorting first must not break the schema
    probe or the decode, and a file whose columns are in a DIFFERENT order
    is aligned by name, never matched positionally; a file with different
    column NAMES raises."""
    import pyarrow as pa
    import pyarrow.ipc as pa_ipc

    from randas_spark.io.read import read_arrow_ipc
    from randas_spark.io.write import to_arrow_ipc

    d = os.path.join(tmp, "ipc_markers")
    os.makedirs(d)
    to_arrow_ipc(people, os.path.join(d, "part0.arrow"))
    with open(os.path.join(d, "_SUCCESS"), "w"):
        pass

    # a second file with the SAME columns in reversed order
    first = pa_ipc.open_file(os.path.join(d, "part0.arrow")).read_all()
    reordered = first.select(list(reversed(first.schema.names)))
    with pa_ipc.new_file(
        os.path.join(d, "part1.arrow"), reordered.schema
    ) as w:
        w.write_table(reordered)

    both = read_arrow_ipc(spark, d).to_spark()
    assert both.count() == 2 * people.to_spark().count()
    # both halves decode identically (alignment by name)
    n_distinct = both.distinct().count()
    assert n_distinct == people.to_spark().distinct().count()

    # mismatched column names -> error on decode
    bad_dir = os.path.join(tmp, "ipc_bad")
    os.makedirs(bad_dir)
    to_arrow_ipc(people, os.path.join(bad_dir, "part0.arrow"))
    renamed = first.rename_columns([f"x_{c}" for c in first.schema.names])
    with pa_ipc.new_file(os.path.join(bad_dir, "part1.arrow"), renamed.schema) as w:
        w.write_table(renamed)
    with pytest.raises(Exception, match="schema mismatch"):
        read_arrow_ipc(spark, bad_dir).to_spark().count()


def test_webdataset_round_trip_reproducible_shards(spark, tmp):
    """WebDataset tar shard sink/source: (1) write → read round-trips
    every (key, ext, payload) triple; (2) shard assignment is
    content-deterministic, so writing the SAME data twice — even from a
    differently-partitioned frame — yields byte-identical shards
    (zeroed tar metadata, key-sorted members); (3) non-binary columns
    encode as utf-8; (4) the manifest accounts for every sample."""
    import os

    from pyspark.sql import functions as F

    from randas_spark.io.webdataset import read_webdataset, write_webdataset

    rows = [(i, f"text of {i}".encode(), f"label-{i % 3}") for i in range(37)]
    df = spark.createDataFrame(rows, "doc_id long, txt binary, cls string")

    d1 = os.path.join(tmp, "wds1")
    man1 = {r.shard_id: r for r in
            write_webdataset(df, d1, "doc_id", ["txt", "cls"], n_shards=4).collect()}
    assert sum(r.n_samples for r in man1.values()) == 37

    back = read_webdataset(spark, d1)
    got = {(r.key, r.ext): bytes(r.payload) for r in back.collect()}
    assert len(got) == 74  # 37 keys x 2 exts
    for i in range(37):
        assert got[(str(i), "txt")] == f"text of {i}".encode()
        assert got[(str(i), "cls")] == f"label-{i % 3}".encode()
    # every row names its shard file
    shards = {r.shard for r in back.select("shard").distinct().collect()}
    assert shards == {f"shard-{s:05d}.tar" for s in man1}

    # reproducibility under different partitioning
    d2 = os.path.join(tmp, "wds2")
    man2 = {r.shard_id: r for r in
            write_webdataset(df.repartition(7, F.col("cls")), d2, "doc_id",
                             ["txt", "cls"], n_shards=4).collect()}
    assert {s: m.sha256 for s, m in man1.items()} == {
        s: m.sha256 for s, m in man2.items()
    }
    for s, m in man1.items():
        p1 = open(os.path.join(d1, f"shard-{s:05d}.tar"), "rb").read()
        p2 = open(os.path.join(d2, f"shard-{s:05d}.tar"), "rb").read()
        assert p1 == p2 and len(p1) == m.n_bytes
        # the .idx sidecars are byte-reproducible too (sorted JSON keys,
        # offsets derive from the deterministic tar layout)
        i1 = open(os.path.join(d1, f"shard-{s:05d}.idx"), "rb").read()
        i2 = open(os.path.join(d2, f"shard-{s:05d}.idx"), "rb").read()
        assert i1 == i2 and len(i1) > 0


def test_webdataset_index_sidecar(spark, tmp):
    """The .idx sidecar must (1) enumerate exactly the members the tar
    reader yields, with matching sizes, WITHOUT reading tar bytes, and
    (2) carry byte ranges that slice the correct payload straight out of
    the shard file — the ranged-fetch contract."""
    import os

    from randas_spark.io.webdataset import (
        read_webdataset,
        read_webdataset_index,
        write_webdataset,
    )

    rows = [(i, f"payload {i}".encode(), f"label-{i % 3}") for i in range(23)]
    df = spark.createDataFrame(rows, "doc_id long, txt binary, cls string")
    d = os.path.join(tmp, "wds_idx")
    write_webdataset(df, d, "doc_id", ["txt", "cls"], n_shards=3).collect()

    full = {(r.key, r.ext): bytes(r.payload) for r in read_webdataset(spark, d).collect()}
    idx = read_webdataset_index(spark, d).collect()
    assert {(r.key, r.ext) for r in idx} == set(full)
    blobs = {}
    for r in idx:
        assert r.n_bytes == len(full[(r.key, r.ext)])
        assert r.shard.endswith(".tar")
        if r.shard not in blobs:
            blobs[r.shard] = open(os.path.join(d, r.shard), "rb").read()
        assert blobs[r.shard][r.offset : r.offset + r.n_bytes] == full[(r.key, r.ext)]

    # write_index=False: no sidecars
    d2 = os.path.join(tmp, "wds_noidx")
    write_webdataset(df, d2, "doc_id", ["txt"], n_shards=2, write_index=False).collect()
    assert not [f for f in os.listdir(d2) if f.endswith(".idx")]


def test_webdataset_guards(spark, tmp):
    """VERDICT r7 item 6 / ADVICE r7: (1) object-store schemes are
    rejected loudly (tasks open() paths directly — only shared
    filesystems work); (2) a shard over max_shard_bytes fails with the
    n_shards fix instead of silently minting an unreadable >2 GiB file;
    (3) file:// is accepted and stripped; (4) the output dir is created
    executor-side (no pre-existing dir required, none made eagerly on
    the driver)."""
    import os

    import pytest

    from randas_spark.io.webdataset import read_webdataset, write_webdataset

    df = spark.createDataFrame(
        [(1, b"x" * 64), (2, b"y" * 64)], "doc_id long, txt binary"
    )
    with pytest.raises(ValueError, match="unsupported path scheme 's3'"):
        write_webdataset(df, "s3://bucket/wds", "doc_id", ["txt"])

    big = os.path.join(tmp, "wds_cap")
    with pytest.raises(Exception, match="max_shard_bytes"):
        write_webdataset(
            df, big, "doc_id", ["txt"], n_shards=1, max_shard_bytes=100
        ).collect()

    d = os.path.join(tmp, "wds_scheme")
    assert not os.path.exists(d)  # lazy plan: no driver-side mkdir
    plan = write_webdataset(df, "file://" + d, "doc_id", ["txt"], n_shards=1)
    assert not os.path.exists(d)
    assert sum(r.n_samples for r in plan.collect()) == 2
    got = {r.key: bytes(r.payload) for r in read_webdataset(spark, d).collect()}
    assert got == {"1": b"x" * 64, "2": b"y" * 64}
