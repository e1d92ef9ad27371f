"""Time-series operators (operators/timeseries.py): resample bucketing,
dense-spine gap fill with forward-fill, and the EWMA recurrence vs
pandas' reference implementation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    from randas_spark.queries import t

    return t(spark, SF_DIR, "events").filter(F.col("user_id") < 5).cache()


def test_gap_fill_spine_is_dense(spark, events):
    from randas_spark.operators.timeseries import gap_fill_ffill

    out = gap_fill_ffill(events, "ts", "user_id", "hour", F.sum("value").alias("v")).cache()
    n_users = events.select("user_id").distinct().count()
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    ).first()
    n_buckets = int((bounds.mx - bounds.mn).total_seconds() // 3600) + 1
    assert out.count() == n_users * n_buckets
    # every user covers the identical spine
    per_user = out.groupBy("user_id").count().collect()
    assert {r["count"] for r in per_user} == {n_buckets}
    # bucket totals reconcile with the raw table
    assert out.agg(F.sum("n_events")).first()[0] == events.count()


def test_gap_fill_forward_fill_semantics(spark, events):
    from randas_spark.operators.timeseries import gap_fill_ffill

    out = gap_fill_ffill(events, "ts", "user_id", "hour", F.sum("value").alias("v"))
    one = sorted(
        out.filter(F.col("user_id") == out.select("user_id").first()[0]).collect(),
        key=lambda r: r.bucket_start,
    )
    seen = None
    hourly = {
        (r.h, ): r.v
        for r in events.filter(F.col("user_id") == one[0].user_id)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum("value").alias("v"))
        .collect()
    }
    for r in one:
        if r.n_events > 0:
            seen = hourly[(r.bucket_start,)]
            assert r.filled_value == pytest.approx(seen)
        elif seen is None:
            assert r.filled_value is None  # before first observation
        else:
            assert r.filled_value == pytest.approx(seen)  # carried forward


def test_ewma_matches_pandas(spark, events):
    from randas_spark.operators.timeseries import ewma_by_key

    out = ewma_by_key(events, "user_id", "ts", "value", alpha=0.3, id_col="event_id")
    got = out.toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    raw = (
        events.select("user_id", "ts", "value", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    expected = (
        raw.groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=0.3, adjust=False).mean())
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        got["ewma"], expected.rename("ewma"), check_exact=False, rtol=1e-12
    )


def test_ewma_validates_alpha(spark, events):
    from randas_spark.operators.timeseries import ewma_by_key

    with pytest.raises(ValueError):
        ewma_by_key(events, "user_id", "ts", "value", alpha=0.0)


def test_resample_equals_manual_bucketing(spark, events):
    from randas_spark.operators.timeseries import resample

    out = resample(events, "ts", ["event_type"], "day", [F.count(F.lit(1)).alias("n")])
    manual = events.groupBy(
        F.date_trunc("day", "ts").alias("bucket_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, manual.collect()))


# -- series similarity (PAA lower-bound range search) ----------------------


def test_paa_lower_bound_and_losslessness(spark):
    """sqrt(w)*dist(paa_a, paa_q) must never exceed the true z-distance
    (GEMINI containment), so the pruned search equals brute force."""
    from pyspark.sql import functions as F

    from randas_spark.operators.timeseries import (
        hourly_profile,
        paa,
        ts_range_search,
        zdist,
        znorm,
    )
    from randas_spark.queries import t

    e = t(spark, SF_DIR, "events")
    prof = hourly_profile(e, "user_id", "ts")
    # every series has 24 slots summing to the user's event count
    r0 = prof.limit(5).collect()
    assert all(len(r.series) == 24 for r in r0)

    # LB <= true distance, for every user against the query
    z = prof.select("user_id", znorm(F.col("series"), 24).alias("z"))
    q = z.filter(F.col("user_id") == 0).select(
        F.col("z").alias("qz"), paa(F.col("z"), 24, 6).alias("qp")
    )
    both = (
        z.filter(F.col("user_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            (F.sqrt(F.lit(4.0)) * zdist(paa(F.col("z"), 24, 6), F.col("qp"))).alias("lb"),
            zdist(F.col("z"), F.col("qz")).alias("d"),
        )
        .collect()
    )
    assert both
    for r in both:
        assert r.lb <= r.d + 1e-9

    # pruned result == brute force, and the prune is non-trivial
    brute = {
        (r.user_id, round(r.d, 6))
        for r in z.filter(F.col("user_id") != 0)
        .crossJoin(F.broadcast(q.select("qz")))
        .select("user_id", zdist(F.col("z"), F.col("qz")).alias("d"))
        .filter(F.col("d") <= 6.0)
        .collect()
    }
    pruned = {
        (r.user_id, round(r.dist, 6))
        for r in ts_range_search(prof, "user_id", 0, radius=6.0).collect()
    }
    assert pruned == brute

    # the prune must actually bite when series are structured: two
    # families of shapes (ramp-up vs ramp-down) — cross-family PAA
    # distance alone already exceeds the radius
    rows = []
    for uid in range(8):
        up = uid < 4
        series = [float((h if up else 23 - h) + (uid % 4)) for h in range(24)]
        rows.append((uid, series))
    synth = spark.createDataFrame(rows, "user_id long, series array<double>")
    zs = synth.select("user_id", znorm(F.col("series"), 24).alias("z"))
    qs = zs.filter(F.col("user_id") == 0).select(
        F.col("z").alias("qz"), paa(F.col("z"), 24, 6).alias("qp")
    )
    sb = (
        zs.filter(F.col("user_id") != 0)
        .crossJoin(F.broadcast(qs))
        .select(
            "user_id",
            (F.sqrt(F.lit(4.0)) * zdist(paa(F.col("z"), 24, 6), F.col("qp"))).alias("lb"),
            zdist(F.col("z"), F.col("qz")).alias("d"),
        )
        .collect()
    )
    radius = 1.0
    assert sum(1 for r in sb if r.lb <= radius) < len(sb)  # prune bites
    spruned = {
        (r.user_id, round(r.dist, 6))
        for r in ts_range_search(synth, "user_id", 0, radius=radius).collect()
    }
    sbrute = {(r.user_id, round(r.d, 6)) for r in sb if r.d <= radius}
    assert spruned == sbrute and sbrute  # non-empty and lossless
