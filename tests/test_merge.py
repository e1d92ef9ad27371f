"""MERGE-shaped maintenance ops (operators/merge.py): upsert semantics
and SCD2 version-chain invariants on small synthetic frames."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

T0 = datetime.datetime(1970, 1, 1)
T1 = datetime.datetime(2024, 6, 1)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(1, 100.0, T0, None), (2, 200.0, T0, None), (3, 300.0, T0, None),
         # key 1 also has a historical closed version
         (1, 50.0, datetime.datetime(1960, 1, 1), T0)],
        "k long, bal double, valid_from timestamp, valid_to timestamp",
    )


@pytest.fixture(scope="module")
def updates(spark):
    return spark.createDataFrame(
        # 1: changed; 2: unchanged value; 4: brand-new key
        [(1, 111.0, T1), (2, 200.0, T1), (4, 400.0, T1)],
        "k long, bal double, ts timestamp",
    )


def test_scd2_version_chains(spark, dim, updates):
    from randas_spark.operators.merge import scd2_apply

    out = scd2_apply(dim, updates, "k", ["bal"], "ts").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)

    # exactly one open version per key
    for k, rows in by_key.items():
        assert sum(1 for r in rows if r.valid_to is None) == 1, k

    # key 1: history row intact, old current closed at T1, new version open
    k1 = sorted(by_key[1], key=lambda r: r.valid_from)
    assert [(r.bal, r.valid_to) for r in k1] == [(50.0, T0), (100.0, T1), (111.0, None)]
    # closed version's valid_to chains to the successor's valid_from
    assert k1[1].valid_to == k1[2].valid_from

    # key 2: unchanged value → still the original open row, no churn
    assert [(r.bal, r.valid_from, r.valid_to) for r in by_key[2]] == [(200.0, T0, None)]
    # key 3: no update → untouched
    assert [(r.bal, r.valid_to) for r in by_key[3]] == [(300.0, None)]
    # key 4: brand-new → inserted open at the update timestamp
    assert [(r.bal, r.valid_from, r.valid_to) for r in by_key[4]] == [(400.0, T1, None)]


def test_merge_upsert_last_write_wins(spark):
    from randas_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    got = sorted(map(tuple, merge_upsert(target, updates, "k").collect()))
    assert got == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_upsert_dedups_updates_with_order_by(spark):
    """Duplicate update rows per key: order_by picks the greatest-valued
    row (last-write-wins inside the batch) and the output carries exactly
    one row per key."""
    from randas_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, "a", 0)], "k long, v string, ts long")
    updates = spark.createDataFrame(
        [(1, "old", 5), (1, "new", 9), (2, "x", 1)], "k long, v string, ts long"
    )
    got = sorted(map(tuple, merge_upsert(target, updates, "k", order_by="ts").collect()))
    assert got == [(1, "new", 9), (2, "x", 1)]


def test_merge_upsert_schema_mismatch_raises(spark):
    from randas_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    bad = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        merge_upsert(target, bad, "k")


def test_point_in_time_join_randomized_against_python_lookup(spark):
    """Randomized (seeded) correctness for point_in_time_join: build
    random non-overlapping version chains per key (last version open),
    random facts, and compare against a per-row pure-Python interval
    lookup — every fact must pick exactly the version covering its
    timestamp (valid_from <= ts < valid_to, open = infinity), facts
    before a key's first version or for unknown keys get NULLs, and no
    fact row is ever dropped or duplicated."""
    import random

    from randas_spark.operators.merge import point_in_time_join

    rng = random.Random(1234)
    dim_rows, chains = [], {}
    for k in range(40):
        n_ver = rng.randint(1, 5)
        cuts = sorted(rng.sample(range(1, 1000), n_ver))
        chain = []
        for i, start in enumerate(cuts):
            end = cuts[i + 1] if i + 1 < n_ver else None
            val = float(k * 100 + i)
            chain.append((start, end, val))
            dim_rows.append((k, val, start, end))
        chains[k] = chain
    fact_rows = [
        (fid, rng.randint(0, 44), rng.randint(0, 1100)) for fid in range(600)
    ]

    dim = spark.createDataFrame(
        dim_rows, "k long, val double, valid_from long, valid_to long"
    )
    facts = spark.createDataFrame(fact_rows, "fid long, k long, ts long")
    got = {
        r.fid: r.val
        for r in point_in_time_join(facts, dim, "k", "ts").collect()
    }
    assert len(got) == len(fact_rows)  # no drops, no dupes

    for fid, k, ts in fact_rows:
        want = None
        for start, end, val in chains.get(k, []):
            if start <= ts and (end is None or ts < end):
                want = val
        assert got[fid] == want, (fid, k, ts, got[fid], want)
