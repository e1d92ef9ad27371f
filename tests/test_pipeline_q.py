"""Semantic pins for the round-5 pipeline-analytics queries
(randas_spark/queries/pipeline.py) beyond the oracle hash:

- the binned interval join must equal the naive range-predicate join
  (the equivalence the docstring claims on the hour grid);
- CDC merge must honor ONLY the latest op per key (a non-latest delete
  marker must not kill the key; a latest delete must);
- last-touch attribution must null out beyond-lookback touches and
  break timestamp ties by event_id.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_interval_join_binned_equals_range_predicate(spark):
    """Grid-binned equi-join == naive overlap predicate on the same
    session/busy-hour inputs (exact equivalence on the hour grid)."""
    from randas_spark.queries.pipeline import rel_interval_join_binned
    from randas_spark.queries import t

    binned = rel_interval_join_binned(spark, SF_DIR)

    e = t(spark, SF_DIR, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    flagged = e.withColumn(
        "new_sess",
        F.when(micros - F.lag(micros).over(w) > 1_800_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = (
        flagged.withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    busy = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("hr"))
        .limit(48)
        .select("hr")
    )
    naive = sess.join(
        F.broadcast(busy),
        (sess.s < busy.hr + F.expr("interval 1 hour")) & (sess.e >= busy.hr),
    ).select("user_id", "sess_id", F.col("hr").alias("busy_hour"))

    assert _rows(binned, "user_id", "sess_id", "busy_hour") == _rows(
        naive, "user_id", "sess_id", "busy_hour"
    )


def _merge_frame(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string, value double"
    )


def test_merge_upsert_latest_op_wins(spark, tmp_path, monkeypatch):
    """Key 1: delete is NOT latest -> survives with the later upsert.
    Key 2: delete IS latest -> key absent. n_ops counts every op."""
    from randas_spark.queries import pipeline

    t0 = dt.datetime(2024, 1, 1)

    def fake_t(_spark, _sf, name):
        assert name == "events"
        return _merge_frame(
            spark,
            [
                (1, 10, t0, "click", 1.0),
                (1, 11, t0 + dt.timedelta(minutes=1), "error", 0.0),
                (1, 12, t0 + dt.timedelta(minutes=2), "purchase", 5.0),
                (2, 20, t0, "view", 2.0),
                (2, 21, t0 + dt.timedelta(minutes=1), "error", 0.0),
            ],
        )

    monkeypatch.setattr(pipeline, "t", fake_t)
    out = pipeline.rel_merge_upsert(spark, "ignored")
    got = {r.user_id: (r.last_op, r.last_value, r.n_ops) for r in out.collect()}
    assert got == {1: ("purchase", 5.0, 3)}


def test_merge_upsert_tie_broken_by_event_id(spark, monkeypatch):
    """Two ops at the identical timestamp: the higher event_id wins."""
    from randas_spark.queries import pipeline

    t0 = dt.datetime(2024, 1, 1)

    def fake_t(_spark, _sf, name):
        return _merge_frame(
            spark, [(7, 1, t0, "click", 1.0), (7, 2, t0, "view", 9.0)]
        )

    monkeypatch.setattr(pipeline, "t", fake_t)
    out = pipeline.rel_merge_upsert(spark, "ignored").collect()
    assert len(out) == 1 and out[0].last_op == "view" and out[0].last_value == 9.0


def test_attribution_lookback_and_ties(spark, monkeypatch):
    """Touch 73h before the purchase -> NULL attribution; touch at the
    SAME ts as the purchase (lower event_id) -> attributed (strictly
    preceding in (ts, event_id) order); later purchase picks the most
    recent touch, not the first."""
    from randas_spark.queries import pipeline

    t0 = dt.datetime(2024, 1, 10)

    def fake_t(_spark, _sf, name):
        return _merge_frame(
            spark,
            [
                # user 1: stale touch (73h gap)
                (1, 1, t0 - dt.timedelta(hours=73), "click", 0.0),
                (1, 2, t0, "purchase", 1.0),
                # user 2: touch shares the purchase timestamp
                (2, 3, t0, "view", 0.0),
                (2, 4, t0, "purchase", 1.0),
                # user 3: two touches, most recent wins
                (3, 5, t0 - dt.timedelta(hours=2), "click", 0.0),
                (3, 6, t0 - dt.timedelta(hours=1), "view", 0.0),
                (3, 7, t0, "purchase", 1.0),
            ],
        )

    monkeypatch.setattr(pipeline, "t", fake_t)
    out = pipeline.rel_attribution_last_touch(spark, "ignored")
    got = {r.user_id: (r.touch_event_id, r.touch_type, r.mins_since_touch) for r in out.collect()}
    assert got[1] == (None, None, None)
    assert got[2] == (3, "view", 0.0)
    assert got[3] == (6, "view", 60.0)


def test_multitouch_credit_splits_and_range_gates(spark, monkeypatch):
    """Linear multi-touch: a purchase with 1 click + 3 views in the 72 h
    window gives click 0.25 / view 0.75; a same-microsecond touch is
    OUT of the range frame (value-based, 1 PRECEDING); a 73 h-old touch
    is out; per-user credits sum to the number of credited purchases."""
    from randas_spark.queries import pipeline

    t0 = dt.datetime(2024, 1, 10)

    def fake_t(_spark, _sf, name):
        return _merge_frame(
            spark,
            [
                # user 1: 1 click + 3 views in window
                (1, 1, t0 - dt.timedelta(hours=5), "click", 0.0),
                (1, 2, t0 - dt.timedelta(hours=4), "view", 0.0),
                (1, 3, t0 - dt.timedelta(hours=3), "view", 0.0),
                (1, 4, t0 - dt.timedelta(hours=2), "view", 0.0),
                (1, 5, t0, "purchase", 1.0),
                # user 2: only a same-timestamp view (excluded) + stale click
                (2, 6, t0 - dt.timedelta(hours=73), "click", 0.0),
                (2, 7, t0, "view", 0.0),
                (2, 8, t0, "purchase", 1.0),
                # user 3: two purchases sharing one click
                (3, 9, t0 - dt.timedelta(hours=1), "click", 0.0),
                (3, 10, t0, "purchase", 1.0),
                (3, 11, t0 + dt.timedelta(hours=1), "purchase", 1.0),
            ],
        )

    monkeypatch.setattr(pipeline, "t", fake_t)
    out = pipeline.rel_attribution_multitouch(spark, "ignored").collect()
    got = {(r.user_id, r.touch_type): (r.credit, r.n_purchases) for r in out}
    assert got[(1, "click")] == (0.25, 1)
    assert got[(1, "view")] == (0.75, 1)
    assert (2, "click") not in got and (2, "view") not in got
    assert got[(3, "click")] == (2.0, 2)  # both purchases fully credited
    assert (3, "view") not in got


def test_feature_binning_is_equi_depth(spark):
    """Decile binning must produce 10 buckets of near-equal size (the
    equi-depth property) covering every row."""
    from randas_spark.queries.pipeline import rel_feature_binning

    out = rel_feature_binning(spark, SF_DIR)
    sizes = {r.bucket: r.n for r in out.groupBy("bucket").count().withColumnRenamed("count", "n").collect()}
    total = sum(sizes.values())
    assert set(sizes) == set(range(10))
    for b, n in sizes.items():
        assert abs(n - total / 10) <= total * 0.02 + 2, (b, n, total)


def test_correlation_matrix_shape_and_symmetric_pairs(spark):
    """6 unique pairs, no self-pairs, corr in [-1, 1], covar finite."""
    from randas_spark.queries.pipeline import rel_correlation_matrix

    from randas_spark.queries.pipeline import _CORR_PAIRS

    rows = rel_correlation_matrix(spark, SF_DIR).collect()
    assert len(rows) == 6
    pairs = {(r.col_a, r.col_b) for r in rows}
    assert pairs == set(_CORR_PAIRS)
    assert all(-1.0 <= r.corr <= 1.0 for r in rows)
