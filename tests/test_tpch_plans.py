"""Plan-level assertions for the TPC-H query shapes: each docstring's
scale claim (semi/anti join, broadcast dimensions, single big shuffle)
is enforced against the executed plan, not just narrated.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def qs(spark):
    from randas_spark.queries import queries

    return queries()


def _plan(spark, qs, name):
    from randas_spark.plans import executed_plan

    return executed_plan(qs[name](spark, SF_DIR))


def test_q04_exists_is_semi_join(spark, qs):
    plan = _plan(spark, qs, "q04_order_priority")
    assert "LeftSemi" in plan


def test_q16_not_in_is_anti_join(spark, qs):
    plan = _plan(spark, qs, "q16_supplier_count")
    assert "LeftAnti" in plan


def test_q21_has_semi_and_anti_legs(spark, qs):
    plan = _plan(spark, qs, "q21_waiting_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q22_not_exists_is_anti_join(spark, qs):
    plan = _plan(spark, qs, "q22_idle_customers")
    assert "LeftAnti" in plan


def test_q05_all_dimensions_broadcast(spark, qs):
    """q05's customer/supplier/nation/region joins must all be broadcast;
    the only shuffle joins are on the fact keys."""
    plan = _plan(spark, qs, "q05_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4


def test_q09_fact_join_count_bounded(spark, qs):
    """part/supplier/nation broadcast; only lineitem⋈orders may
    sort-merge. No nested-loop joins anywhere."""
    plan = _plan(spark, qs, "q09_product_profit")
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("SortMergeJoin") <= 1


def test_q01_aggregation_is_partial_then_final(spark, qs):
    """Map-side partial aggregation must precede the shuffle (the
    'partial_sum' markers) — at 100TB this is the difference between
    shuffling 6B rows and shuffling a few hundred."""
    plan = _plan(spark, qs, "q01_pricing_summary")
    assert "partial_" in plan


def test_scan_projections_are_pruned(spark, qs):
    """q06 touches 4 lineitem columns; the parquet ReadSchema must not
    include the rest (column pruning reached the scan)."""
    plan = _plan(spark, qs, "q06_forecast_revenue")
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas
    for line in read_schemas:
        assert "l_returnflag" not in line and "l_orderkey" not in line
