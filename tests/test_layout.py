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


def test_dynamic_partition_pruning_from_dim_filter(spark, orders, tmp_path):
    """DYNAMIC partition pruning: when the partition column is only
    constrained through a join with a filtered dimension, the fact scan
    must still prune — Spark injects a runtime subquery
    (``dynamicpruning`` in PartitionFilters) fed by the dim side. This
    is the 100 TB behavior that makes star-schema date/status filters
    skip fact partitions without the filter ever being written against
    the fact."""
    from randas_spark.io.layout import read_pruned, write_partitioned

    path = str(tmp_path / "orders_dpp")
    write_partitioned(orders, path, ["o_orderstatus"])
    fact = read_pruned(spark, path)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")], "status string, label string"
    ).filter(F.col("label") == "finished")
    joined = fact.join(dim.hint("broadcast"), fact.o_orderstatus == dim.status)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert joined.count() == want


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


def _file_stats(path, cols):
    """Per-parquet-file (min, max) for each col, from footer metadata —
    what Spark's scan uses to skip files/row-groups."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                col = row_group.column(i)
                c = col.path_in_schema
                if c in cols and col.statistics is not None:
                    st = col.statistics
                    mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                    maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def test_zorder_layout_skips_on_both_dims(spark, tmp_path):
    """Z-order clustering must give tight per-file min/max stats on BOTH
    keyed columns: a 2-D box predicate overlaps far fewer files than
    under a plain single-column sort layout (where the trailing dimension
    spans its full range in every file), and results are identical."""
    from pyspark.sql import functions as F

    from randas_spark.io.layout import write_zordered
    from randas_spark.queries import t

    events = t(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    n_files = 16

    z_path = str(tmp_path / "z")
    write_zordered(events, z_path, ["user_id", "value"], num_files=n_files)

    s_path = str(tmp_path / "s")  # control: plain sort by the leading col
    (
        events.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    # a selective box on both dimensions, derived from the data's actual
    # ranges (~a thin slice of each)
    ustats = events.agg(F.min("user_id"), F.max("user_id")).first()
    u_span = ustats[1] - ustats[0]
    lo_u = int(ustats[0] + 0.40 * u_span)
    hi_u = int(ustats[0] + 0.50 * u_span)
    stats = events.agg(F.min("value"), F.max("value")).first()
    v_span = stats[1] - stats[0]
    lo_v, hi_v = stats[0] + 0.4 * v_span, stats[0] + 0.45 * v_span

    def overlapping(path):
        files = _file_stats(path, ["user_id", "value"])
        assert files, path
        return sum(
            1
            for f in files
            if f["user_id"][0] <= hi_u
            and f["user_id"][1] >= lo_u
            and f["value"][0] <= hi_v
            and f["value"][1] >= lo_v
        ), len(files)

    z_hit, z_total = overlapping(z_path)
    s_hit, s_total = overlapping(s_path)
    assert z_total >= n_files // 2 and s_total >= n_files // 2
    # plain sort: user_id prunes, value spans everything → nearly all
    # user-matching files overlap. Z-order: both dims prune.
    assert z_hit < s_hit, (z_hit, z_total, s_hit, s_total)
    assert z_hit <= z_total // 2, (z_hit, z_total)

    # correctness: identical result set through the z-ordered layout
    pred = (
        (F.col("user_id").between(lo_u, hi_u))
        & (F.col("value").between(lo_v, hi_v))
    )
    want = sorted(r.event_id for r in events.filter(pred).collect())
    got = sorted(
        r.event_id for r in spark.read.parquet(z_path).filter(pred).collect()
    )
    assert got == want


def test_compact_dataset_unpartitioned(spark, orders, tmp_path):
    """40 tiny files compact to the byte-computed target count with
    identical content."""
    from randas_spark.io.layout import compact_dataset, dataset_file_stats

    path = str(tmp_path / "orders_small_files")
    orders.repartition(40).write.parquet(path)
    before = dataset_file_stats(spark, path)
    assert before["n_files"] == 40

    rows_before = sorted(
        spark.read.parquet(path).collect(), key=lambda r: r.o_orderkey
    )
    # target sized so the whole table fits in a couple of files
    target = max(1, before["total_bytes"] // 2)
    out = compact_dataset(spark, path, target_file_bytes=target)
    assert out["files_before"] == 40
    assert out["files_after"] <= 4  # ceil(total/target)=2 + writer rounding
    rows_after = sorted(
        spark.read.parquet(path).collect(), key=lambda r: r.o_orderkey
    )
    assert rows_before == rows_after
    # no temp dir left behind
    assert not os.path.exists(path + ".__compact_tmp__")


def test_compact_dataset_partitioned_preserves_pruning(spark, orders, tmp_path):
    """Partitioned compaction keeps the hive directory tree (pruning
    still works) while collapsing the per-directory file count."""
    from randas_spark.io.layout import compact_dataset, dataset_file_stats

    path = str(tmp_path / "orders_part_small")
    (
        orders.repartition(20)
        .write.partitionBy("o_orderstatus")
        .parquet(path)
    )
    before = dataset_file_stats(spark, path)
    assert before["n_files"] > 20  # ~20 per status directory

    out = compact_dataset(
        spark,
        path,
        target_file_bytes=before["total_bytes"] * 2,
        partition_cols=["o_orderstatus"],
    )
    assert out["files_after"] < out["files_before"]
    # directory tree intact → pruning predicate still a PartitionFilter
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    pruned = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # content identical
    n = spark.read.parquet(path).count()
    assert n == orders.count()


def test_q12_bucketed_inputs_join_without_exchange(spark, orders):
    """The REAL headline query (TPC-H Q12 core) over bucketed fact
    tables: the orderkey sort-merge join must run with zero Exchange
    below the join (the write-once layout pays the shuffle), and the
    answer must equal the plain-parquet run row-for-row. The final
    3-row groupBy exchange above the join is expected and excluded."""
    from randas_spark.io.layout import write_bucketed
    from randas_spark.queries import t
    from randas_spark.queries.tpch import q12_core

    li = t(spark, SF_DIR, "lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(li, "li_q12_b", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
        write_bucketed(
            orders, "o_q12_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"]
        )
        bucketed = q12_core(spark.table("li_q12_b"), spark.table("o_q12_b"))
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1500]
        below_join = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning" not in below_join, below_join[:1500]

        plain = {
            (r.shipmode): (r.high_line_count, r.low_line_count)
            for r in q12_core(li, orders).collect()
        }
        got = {
            (r.shipmode): (r.high_line_count, r.low_line_count)
            for r in bucketed.collect()
        }
        assert got == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS li_q12_b")
        spark.sql("DROP TABLE IF EXISTS o_q12_b")


def test_incremental_near_dedup_bucketed_ledger_shuffles_batch_only(spark):
    """The incremental_near_dedup docstring's production claim, proven:
    with the ledger's (doc_id, band_id, bk) band keys PRECOMPUTED and
    stored bucketed on the join key, the per-batch candidate join reads
    the ledger shuffle-free — the ONLY Exchange below the join belongs
    to the batch side. This is the property that makes per-batch dedup
    cost O(batch), not O(corpus), at 100 TB. Candidate pairs must equal
    the recomputed-ledger form exactly."""
    from pyspark.sql import functions as F

    from randas_spark.io.layout import write_bucketed
    from randas_spark.operators.dedup import portable_banded_signatures
    from randas_spark.queries import t

    docs = t(spark, SF_DIR, "documents")
    split = 400
    batch = docs.filter(F.col("doc_id") >= split)
    ledger = docs.filter(F.col("doc_id") < split)
    b_banded = portable_banded_signatures(batch, "doc_id", "text")
    l_banded = portable_banded_signatures(ledger, "doc_id", "text")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            l_banded, "near_ledger_b", ["band_id", "bk"], num_buckets=8,
            sort_cols=["band_id", "bk"],
        )
        led = spark.table("near_ledger_b")
        cand = (
            b_banded.alias("a")
            .join(led.alias("b"), ["band_id", "bk"])
            .select(F.col("a.doc_id").alias("id_batch"), F.col("b.doc_id").alias("id_led"))
            .distinct()
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1500]
        below = plan.split("SortMergeJoin")[-1]
        # the bucketed ledger is read bucket-aligned (no exchange, no
        # signature recompute); the only below-join exchanges are the
        # batch side's own two (its signature groupBy(doc_id) + the
        # (band_id, bk) join alignment)
        assert "SelectedBucketsCount" in below, below[:2000]
        assert below.count("Exchange hashpartitioning") == 2, below[:2000]

        recomputed = (
            b_banded.alias("a")
            .join(l_banded.alias("b"), ["band_id", "bk"])
            .select(F.col("a.doc_id").alias("id_batch"), F.col("b.doc_id").alias("id_led"))
            .distinct()
        )
        # recomputing the ledger instead costs its two exchanges back
        rplan = recomputed._jdf.queryExecution().executedPlan().toString()
        rbelow = rplan.split("SortMergeJoin")[-1] if "SortMergeJoin" in rplan else rplan
        assert rbelow.count("Exchange hashpartitioning") >= 3, rbelow[:2000]
        assert sorted(map(tuple, cand.collect())) == sorted(map(tuple, recomputed.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS near_ledger_b")


def test_aqe_skew_join_splits_the_hot_partition(spark):
    """The SCALE.md skew story's runtime half, proven: rel_join_salted
    covers MANUAL salting; here AQE's skew-join handles the same shape
    with no code change — a hot key funnels 10% of the left side into
    one partition, and the finalized adaptive plan must show
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead (the hot
    partition split across tasks at runtime). Thresholds are lowered to
    make local-mode data cross the skew bar; on a cluster the defaults
    (256MB) play the same role."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 == 0, 7).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        j = left.join(right, "k")
        n = len(j.collect())
        # hot key 7 matches 20001 left rows x 1 right row; other ids < 50000
        # and not %10==0 match once
        assert n == 20001 + sum(1 for i in range(50000) if i % 10 != 0 and i != 7)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
