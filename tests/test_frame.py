"""Parity unit tests mirroring the reference's 26 dataframe.rs tests
(golden values from FIXTURES.md A1/A2, hard-coded in
/root/reference/src/dataframe/dataframe.rs:1021-1691)."""

import math

import pytest

from pyspark.sql import functions as F

from randas_spark.frame import RandasFrame, parse_query


# -- aggregates (golden values dataframe.rs:1293-1366) ----------------------


def test_sum_numeric(people):
    assert people.sum("Score") == 10.0  # dataframe.rs:1293


def test_sum_nonnumeric_is_zero(people):
    assert people.sum("Name") == 0.0  # dataframe.rs:1296-1297 quirk


def test_sum_missing_column_is_none(people):
    assert people.sum("nope") is None


def test_mean(people):
    assert people.mean("Score") == pytest.approx(3.3333333333333335)  # :1309


def test_mean_nonnumeric_is_none(people):
    assert people.mean("Name") is None


def test_max_all_columns(people):
    assert people.max() == [3.0, None, 4.0]  # dataframe.rs:1323-1327


def test_min_all_columns(people):
    assert people.min() == [1.0, None, 2.5]  # dataframe.rs:1338-1343


def test_variance_sample(people):
    assert people.variance("Score") == pytest.approx(0.58333333, abs=1e-3)  # :1350-1357


def test_std_dev(people):
    assert people.std_dev("Score") == pytest.approx(math.sqrt(0.5833333333), abs=1e-3)


def test_count_per_column(people):
    assert people.count() == [3, 3, 3]


def test_shape(people):
    assert people.shape() == (3, 3)  # dataframe.rs:1380-1382


# -- access (dataframe.rs:1145-1149, 1492-1507) -----------------------------


def test_get_cell(people):
    assert people.get(0, "Name") == "Alice"
    assert people.get(99, "Name") is None  # OOB row → None (test :1145-1149)


def test_iloc_bounds(people):
    assert people.iloc(1, 1) == "Bob"
    with pytest.raises(IndexError):
        people.iloc(9, 0)
    with pytest.raises(IndexError):
        people.iloc(0, 9)


def test_loc_rows_cols(people):
    sub = people.loc([0, 2], ["Name", "Score"])
    assert sub.columns == ["Name", "Score"]
    assert sub.column("Name") == ["Alice", "Charlie"]
    assert sub.index() == ["0", "2"]  # original labels kept (dataframe.rs:427-431)
    with pytest.raises(IndexError):
        people.loc([99])
    with pytest.raises(KeyError):
        people.loc([0], ["nope"])


def test_column_and_collect(people):
    assert people.column("Score") == [3.5, 4.0, 2.5]
    assert people.column("nope") is None
    with pytest.raises(KeyError):
        people.collect_column_values("nope")


def test_extract_numeric_values(people):
    assert people.extract_numeric_values("ID") == [1.0, 2.0, 3.0]
    assert people.extract_numeric_values("Name") == []


# -- mutation (dataframe.rs:137-182) ----------------------------------------


def test_add_column_literal(spark, people):
    out = people.add_column("Bonus", [1.0, 2.0, 3.0])
    assert out.columns == ["ID", "Name", "Score", "Bonus"]
    assert out.column("Bonus") == [1.0, 2.0, 3.0]


def test_add_column_length_mismatch(people):
    with pytest.raises(ValueError):
        people.add_column("Bonus", [1.0])


def test_add_column_expression(people):
    out = people.add_column("Doubled", F.col("Score") * 2)
    assert out.column("Doubled") == [7.0, 8.0, 5.0]


def test_remove_column(people):
    out = people.remove_column("Score")
    assert out.columns == ["ID", "Name"]
    with pytest.raises(KeyError):
        people.remove_column("nope")  # reference errors too (dataframe.rs:168-182)


# -- filtering (dataframe.rs:1510-1553, 1684-1689) --------------------------


def test_query_string_eq(people):
    out = people.query("Name == Alice")
    assert out.shape()[0] == 1
    assert out.column("ID") == [1]


def test_query_int_literal(people):
    out = people.query("ID == 1")
    assert out.shape()[0] == 1
    assert out.index() == ["0"]  # label preserved (dataframe.rs:1684-1689)
    assert out.column("Name") == ["Alice"]


def test_query_cross_type_miss(people):
    # int literal vs double column: typed equality matches nothing
    assert people.query("Score == 4").shape()[0] == 0  # dataframe.rs:848-852
    # float literal vs int column: same miss the other way
    assert people.query("ID == 1.0").shape()[0] == 0


def test_query_malformed_raises(people):
    with pytest.raises(ValueError):
        people.query("no equals here")
    with pytest.raises(KeyError):
        people.query("nope == 1")


def test_parse_query_literal_ladder():
    assert parse_query("c == 4") == ("c", 4)
    assert parse_query("c == 4.5") == ("c", 4.5)
    assert parse_query("c == abc") == ("c", "abc")


def test_boolean_index_preserves_labels(people):
    out = people.boolean_index([False, True, False])
    assert out.column("Name") == ["Bob"]
    assert out.index() == ["1"]  # dataframe.rs:1514-1532


def test_boolean_index_length_validated(people):
    # reference has a bug here (checks column count); we validate row count
    with pytest.raises(ValueError):
        people.boolean_index([True, False])


def test_apply_condition_and_filter(people):
    mask = people.apply_condition("Score", lambda v: v > 3.0)
    assert mask == [True, True, False]  # dataframe.rs:1539-1553
    out = people.filter_by_condition(mask)
    assert out.column("Name") == ["Alice", "Bob"]
    assert out.index() == ["0", "1"]  # index RESET (dataframe.rs:527)


def test_apply_condition_null_is_false(spark):
    f = RandasFrame.new(spark, {"x": [1.0, None, 3.0]}, ["x"])
    assert f.apply_condition("x", lambda v: v > 0) == [True, False, True]


def test_head_tail(people):
    assert people.head(2).column("Name") == ["Alice", "Bob"]
    assert people.tail(2).column("Name") == ["Bob", "Charlie"]
    assert people.tail(2).index() == ["1", "2"]


# -- describe (quirks dataframe.rs:599-658) ---------------------------------


def test_describe_quirks(people):
    d = people.describe()
    assert d.columns == ["Statistic", "ID", "Score"]
    stats = dict(zip(d.column("Statistic"), d.column("Score")))
    assert stats["Count"] == 3.0
    assert stats["Mean"] == pytest.approx(10.0 / 3)
    # POPULATION std dev (divides by n), not sample (dataframe.rs:621-626)
    pop = math.sqrt(((3.5 - 10 / 3) ** 2 + (4.0 - 10 / 3) ** 2 + (2.5 - 10 / 3) ** 2) / 3)
    assert stats["Std Dev"] == pytest.approx(pop)
    # index-pick quartiles: sorted [2.5, 3.5, 4.0], picks idx 0, 1, 2
    assert stats["25%"] == 2.5
    assert stats["50%"] == 3.5
    assert stats["75%"] == 4.0


# -- concat (dataframe.rs:671-744) ------------------------------------------


def test_concat_rows_relabels(spark, people):
    other = RandasFrame.new(
        spark, {"ID": [4], "Name": ["Dora"], "Score": [1.5]}, ["ID", "Name", "Score"]
    )
    out = people.concat(other, axis=0)
    assert out.shape() == (4, 3)
    assert out.index() == ["0", "1", "2", "3-0"]  # "{offset+i}-{orig}" (dataframe.rs:702-710)


def test_concat_rows_column_mismatch(spark, people):
    other = RandasFrame.new(spark, {"ID": [4]}, ["ID"])
    with pytest.raises(ValueError):
        people.concat(other, axis=0)


def test_concat_columns(spark, people):
    other = RandasFrame.new(spark, {"Grade": ["A", "B", "C"]}, ["Grade"])
    out = people.concat(other, axis=1)
    assert out.columns == ["ID", "Name", "Score", "Grade"]
    assert out.column("Grade") == ["A", "B", "C"]


def test_concat_columns_overlap_rejected(spark, people):
    other = RandasFrame.new(spark, {"Name": ["x", "y", "z"]}, ["Name"])
    with pytest.raises(ValueError):
        people.concat(other, axis=1)


def test_concat_columns_rowcount_validated(spark, people):
    # reference bug: checks column counts (dataframe.rs:721); we check rows
    other = RandasFrame.new(spark, {"Grade": ["A"]}, ["Grade"])
    with pytest.raises(ValueError):
        people.concat(other, axis=1)


def test_concat_bad_axis(people):
    with pytest.raises(ValueError):
        people.concat(people, axis=2)


# -- null handling (FIXTURES.md A2, dataframe.rs:1595-1678) -----------------


def test_dropna(spark):
    f = RandasFrame.new(
        spark,
        {"ID": [1, None], "Name": ["Alice", "Bob"], "Score": [3.5, None]},
        ["ID", "Name", "Score"],
    )
    out = f.dropna()
    assert out.shape()[0] == 1
    assert out.column("Name") == ["Alice"]  # dataframe.rs:1621-1635


def test_fillna_single_column(spark):
    f = RandasFrame.new(
        spark,
        {"ID": [1, None], "Name": ["Alice", None], "Score": [3.5, None]},
        ["ID", "Name", "Score"],
    )
    out = f.fillna("Score", 0.0)
    assert out.column("Score") == [3.5, 0.0]
    assert out.column("ID") == [1, None]  # other columns untouched (:1661-1678)
    assert out.column("Name") == ["Alice", None]


# -- equality / display (dataframe.rs:947-1019) -----------------------------


def test_equals(spark, people):
    same = RandasFrame.new(
        spark,
        {"ID": [1, 2, 3], "Name": ["Alice", "Bob", "Charlie"], "Score": [3.5, 4.0, 2.5]},
        ["ID", "Name", "Score"],
    )
    assert people.equals(same)
    assert not people.equals(same.remove_column("Score"))


def test_scatter_plot_renders_png(people, tmp_path):
    """scatter_plot parity (dataframe.rs:888-944): numeric length check
    runs distributed; rendering is the dependency-free stdlib rasterizer
    (operators/plot.py) — un-gated since round 5. The written PNG decodes
    with the repo's own codec and contains axis and point pixels."""
    import pytest as _pytest

    with _pytest.raises(ValueError):
        # length mismatch is detected before any rendering
        people.filter_by_condition([True, True, False]).add_column(
            "Z", [1.0, 2.0]
        ).scatter_plot("Score", "Name", str(tmp_path / "x.png"))
    path = str(tmp_path / "s.png")
    people.scatter_plot("ID", "Score", path)

    from randas_spark.operators.png import decode_png

    with open(path, "rb") as fh:
        w, h, ch, pixels = decode_png(fh.read())
    assert (w, h, ch) == (640, 480, 3)
    colors = {tuple(pixels[i : i + 3]) for i in range(0, len(pixels), 3)}
    assert (255, 255, 255) in colors  # background
    assert (0, 0, 0) in colors  # axes
    assert (31, 119, 180) in colors  # points
    # 3 points of radius 2 → at least 3 * ~13 px of point color, minus overlap
    n_point_px = sum(
        1
        for i in range(0, len(pixels), 3)
        if tuple(pixels[i : i + 3]) == (31, 119, 180)
    )
    assert n_point_px >= 26


def test_render_scatter_edge_cases(tmp_path):
    """Degenerate ranges center points; empty input and length mismatch
    raise like the reference's asserts."""
    import pytest as _pytest

    from randas_spark.operators.plot import render_scatter
    from randas_spark.operators.png import decode_png

    with _pytest.raises(ValueError):
        render_scatter([], [])
    with _pytest.raises(ValueError):
        render_scatter([1.0], [1.0, 2.0])
    # constant x and y → single centered dot, still a valid PNG
    w, h, ch, pixels = decode_png(render_scatter([5.0, 5.0], [7.0, 7.0]))
    assert (w, h, ch) == (640, 480, 3)
    center_off = ((h // 2) * w + w // 2) * 3
    assert tuple(pixels[center_off : center_off + 3]) == (31, 119, 180)


def test_to_string_display(people):
    s = people.to_string()
    assert "Alice" in s and "3.50" in s  # floats %.2f (dataframe.rs:1006-1011)
    f2 = people.fillna("Name", "x")  # no nulls; just exercises path
    assert "NA" not in f2.to_string()


def test_from_values(spark):
    f = RandasFrame.from_values(
        spark, ["a", "b"], [[1, "x"], [2, "y"]]
    )
    assert f.shape() == (2, 2)
    assert f.column("b") == ["x", "y"]
    with pytest.raises(ValueError):
        RandasFrame.from_values(spark, ["a"], [[1, 2]])


def test_new_unequal_lengths(spark):
    with pytest.raises(ValueError):
        RandasFrame.new(spark, {"a": [1], "b": [1, 2]}, ["a", "b"])


def test_ingest_index_multi_partition(spark):
    """zipWithIndex-style __pos__ must equal the global-window numbering
    on a genuinely multi-partition frame, and its plan must not sort the
    data through a single partition."""
    from pyspark.sql import Window

    from randas_spark.frame import _with_ingest_index

    src = spark.range(0, 997, 1, 7).select((F.col("id") * 3).alias("v"))
    got = _with_ingest_index(src)
    w = Window.orderBy(F.monotonically_increasing_id())
    want = src.withColumn("__pos__", F.row_number().over(w) - 1)
    assert {(r["v"], r["__pos__"]) for r in got.collect()} == {
        (r["v"], r["__pos__"]) for r in want.collect()
    }
    idx = {r["__pos__"]: r["__index__"] for r in got.collect()}
    assert idx[0] == "0" and idx[996] == "996" and len(idx) == 997
    # scale shape: the DATA never crosses a single-partition exchange —
    # the only one allowed is the prefix-sum window over the tiny
    # per-partition counts aggregate; the data side re-enters via a
    # broadcast join. (The old global-window form had the full frame
    # behind Exchange SinglePartition with a Window above it.)
    plan = got._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan")[0]  # AQE prints the plan twice
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_ingest_index_wrap_facade_multi_partition(spark):
    """RandasFrame over a 5-partition source: positional ops stay correct."""
    src = spark.range(0, 100, 1, 5).select(F.col("id").cast("double").alias("x"))
    f = RandasFrame(src)
    assert f.shape() == (100, 1)
    assert f.iloc(0, 0) == 0.0
    assert f.iloc(99, 0) == 99.0
    assert f.head(3).column("x") == [0.0, 1.0, 2.0]
    assert f.tail(2).column("x") == [98.0, 99.0]
