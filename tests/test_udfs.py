"""UDF surface matrix tests (SURVEY.md §2.11): scalar closure predicate
(covered in test_frame), grouped-agg pandas UDF, Python UDTF.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_weighted_mean_grouped_agg(spark):
    from randas_spark.functions.udfs import weighted_mean

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 1.0), ("b", 20.0, 0.0)],
        "k string, v double, w double",
    )
    got = {
        r.k: r.wm
        for r in df.groupBy("k").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    assert got["a"] == pytest.approx((1.0 + 9.0) / 4.0)
    assert got["b"] == pytest.approx(10.0)


def test_weighted_mean_matches_builtin(spark):
    """The pandas-UDF aggregate must equal the pure-expression twin
    sum(v*w)/sum(w) — the correctness bridge that justifies using the
    built-in form in hot paths."""
    from randas_spark.functions.udfs import weighted_mean
    from randas_spark.queries import t
    from tests.conftest import SF_DIR

    li = t(spark, SF_DIR, "lineitem")
    udf_side = {
        r.l_returnflag: r.wm
        for r in li.groupBy("l_returnflag")
        .agg(weighted_mean("l_extendedprice", "l_quantity").alias("wm"))
        .collect()
    }
    expr_side = {
        r.l_returnflag: r.wm
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity")
            ).alias("wm")
        )
        .collect()
    }
    for k, v in expr_side.items():
        assert udf_side[k] == pytest.approx(v, rel=1e-12)


def test_split_words_udtf(spark):
    from randas_spark.functions.udfs import SplitWords

    spark.udtf.register("split_words", SplitWords)
    rows = spark.sql(
        "SELECT * FROM split_words('the quick fox')"
    ).collect()
    assert [(r.word, r.pos) for r in rows] == [("the", 0), ("quick", 1), ("fox", 2)]


def test_split_words_udtf_lateral(spark):
    """UDTF in a LATERAL join — one row per word per input row, null-safe."""
    from randas_spark.functions.udfs import SplitWords

    spark.udtf.register("split_words", SplitWords)
    spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "c")], "id long, txt string"
    ).createOrReplaceTempView("t_udtf")
    rows = spark.sql(
        "SELECT id, word, pos FROM t_udtf, LATERAL split_words(txt)"
    ).collect()
    got = sorted((r.id, r.word, r.pos) for r in rows)
    assert got == [(1, "a", 0), (1, "b", 1), (3, "c", 0)]
