"""Physical-layout tests: partition pruning and shuffle-free bucketed
joins, asserted at the PLAN level — these are the 100 TB behaviors the
small-SF run can't measure but the plan fully determines.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def orders(spark):
    from randas_spark.queries import t

    return t(spark, SF_DIR, "orders")


def test_partitioned_write_prunes_directories(spark, orders, tmp_path):
    from randas_spark.io.layout import read_pruned, write_partitioned

    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, ["o_orderstatus"])
    # hive-style directories exist
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))

    pruned = read_pruned(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the equality predicate lands in PartitionFilters (directory pruning),
    # not in the data filters — non-matching files are never opened
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]

    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == want


def test_bucketed_join_has_no_exchange(spark, orders, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with zero
    Exchange operators — the write-once/join-free-forever trade."""
    from randas_spark.io.layout import write_bucketed
    from randas_spark.queries import t

    # (warehouse dir is a static conf — managed tables land in the default
    # ./spark-warehouse and are dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8)
        li = t(spark, SF_DIR, "lineitem")
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            ["o_orderkey"],
            num_buckets=8,
        )
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_unbucketed_same_join_does_exchange(spark, orders):
    """Control: the identical join over plain parquet shuffles both sides
    (proves the bucketing, not something else, removed the exchanges)."""
    from randas_spark.queries import t

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = t(spark, SF_DIR, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
        joined = orders.join(li, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
