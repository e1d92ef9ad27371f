"""Salted join / aggregation: result-identity with the unsalted plan and
the partition-spreading effect that is their entire purpose.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def skewed(spark):
    """A deliberately skewed fact table: 90% of rows share one key."""
    n = 20000
    return (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit(1))
            .otherwise((F.col("id") % 100).cast("long"))
            .alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_row_identical(spark, skewed, dim):
    from randas_spark.operators.skew import salted_join

    plain = skewed.join(dim, "k")
    salted = salted_join(skewed, dim, "k", num_salts=8)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_left_keeps_unmatched(spark, skewed, dim):
    from randas_spark.operators.skew import salted_join

    dim_partial = dim.filter(F.col("k") < 50)
    plain = skewed.join(dim_partial, "k", "left")
    salted = salted_join(skewed, dim_partial, "k", num_salts=8, how="left")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_spreads_hot_key(spark, skewed, dim):
    """The hot key's rows must land in >1 shuffle partition after salting
    (the unsalted join puts them all in one)."""
    from randas_spark.operators.skew import salted_join

    salted = salted_join(skewed, dim, "k", num_salts=8)
    hot = salted.filter(F.col("k") == 1).select(F.spark_partition_id().alias("p"))
    n_parts = hot.distinct().count()
    assert n_parts > 1, "salting must spread the hot key across partitions"


def test_salted_agg_matches_plain(spark, skewed):
    from randas_spark.operators.skew import salted_agg

    plain = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            skewed,
            ["k"],
            {
                "n": F.count(F.lit(1)),
                "s": F.sum("v"),
                "mn": F.min("v"),
                "mx": F.max("v"),
            },
            num_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    from randas_spark.operators.skew import salted_agg

    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"xs": F.collect_list("v")}).collect()


def test_salted_join_rejects_unsupported_how(spark, skewed, dim):
    from randas_spark.operators.skew import salted_join

    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="full")
