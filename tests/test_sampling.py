"""Deterministic sampling operators (operators/sampling.py).

Reference has no sampling (SURVEY.md §2.12); these are engine additions
for reproducible corpus work. Key properties under test: determinism
across partitionings (the reason these exist instead of df.sample),
exact stratum counts, split exclusivity/exhaustiveness, and rate
accuracy of the hash threshold.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from randas_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    systematic_sample,
    train_test_split,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from randas_spark.queries import t

    return t(spark, SF, "documents")


def test_systematic_sample_exact_membership(docs):
    got = {r.doc_id for r in systematic_sample(docs, "doc_id", 7, 2).select("doc_id").collect()}
    everything = {r.doc_id for r in docs.select("doc_id").collect()}
    assert got == {i for i in everything if i % 7 == 2}
    assert got  # non-trivial on the fixture


def test_systematic_sample_validates_args(docs):
    with pytest.raises(ValueError):
        systematic_sample(docs, "doc_id", 10, 10)
    with pytest.raises(ValueError):
        systematic_sample(docs, "doc_id", 0)


def test_hash_sample_matches_python_md5_and_rate(docs):
    rate = 0.25
    got = {r.doc_id for r in hash_sample(docs, "doc_id", rate).select("doc_id").collect()}
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    thresh = format(int(rate * 16**8), "08x")
    expected = {i for i in ids if hashlib.md5(str(i).encode()).hexdigest() < thresh}
    assert got == expected
    # md5 is uniform: rate within ±5 points on ~1k docs
    assert abs(len(got) / len(ids) - rate) < 0.05


def test_hash_sample_invariant_under_repartition(docs):
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(13), "doc_id", 0.3).select("doc_id").collect()
    }
    assert a == b


def test_stratified_sample_exact_counts(docs):
    n = 5
    out = stratified_sample(docs, ["lang"], n, "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {lang: min(n, size) for lang, size in sizes.items()}
    assert "__rn__" not in out.columns


def test_stratified_sample_deterministic(docs):
    a = sorted(r.doc_id for r in stratified_sample(docs, ["lang"], 3, "doc_id").collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample(docs.repartition(17), ["lang"], 3, "doc_id").collect()
    )
    assert a == b


def test_train_test_split_exclusive_exhaustive(docs):
    out = train_test_split(docs, "doc_id", 0.1)
    assert out.count() == docs.count()
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "test"}
    # membership recomputable from the key alone
    test_ids = {r.doc_id for r in out.filter(F.col("split") == "test").collect()}
    thresh = format(int(0.1 * 16**8), "08x")
    for i in list(test_ids)[:20]:
        assert hashlib.md5(str(i).encode()).hexdigest() < thresh


def test_hash_sample_boundary_rates(docs):
    """rate=1.0 must keep EVERY row (the naive 9-hex-char threshold kept
    ~1/16) and rate=0.0 must keep none; train_test_split at test_rate=1.0
    labels everything 'test'."""
    n = docs.count()
    assert hash_sample(docs, "doc_id", 1.0).count() == n
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    all_test = train_test_split(docs, "doc_id", 1.0)
    assert all_test.filter(F.col("split") == "test").count() == n
    no_test = train_test_split(docs, "doc_id", 0.0)
    assert no_test.filter(F.col("split") == "test").count() == 0


def test_sampling_is_scan_side(docs):
    """systematic/hash sampling must not shuffle — the predicate stays on
    the scan (narrow plan, no Exchange)."""
    plan = hash_sample(docs, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_mixture_flattens_imbalance(spark):
    """alpha<1 must give the SMALL source a higher keep-rate than the
    big one (flattening), alpha=1 equal rates (natural proportions);
    expected totals near target_frac."""
    from pyspark.sql import functions as F

    from randas_spark.operators.corpus import temperature_mixture_sample

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    kept = temperature_mixture_sample(df, "source", "doc_id", alpha=0.5, target_frac=0.5)
    frac = {
        r.source: r.k / (900 if r.source == "big" else 100)
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("k")).collect()
    }
    assert frac["small"] > frac["big"]  # flattening
    assert abs(kept.count() / 1000 - 0.5) < 0.1  # near target overall

    natural = temperature_mixture_sample(df, "source", "doc_id", alpha=1.0, target_frac=0.5)
    nf = {
        r.source: r.k / (900 if r.source == "big" else 100)
        for r in natural.groupBy("source").agg(F.count(F.lit(1)).alias("k")).collect()
    }
    assert abs(nf["small"] - nf["big"]) < 0.15  # equal rates up to hash noise


def test_importance_resample_corpus_never_shuffles(docs, spark):
    """The corpus side must stay scan-side: the only Exchange(s) in the
    executed plan belong to the single-row Σw aggregate (a
    SinglePartition exchange over partial aggregates), never a
    hash-partitioning of the corpus — the property that makes the
    operator a filter at 100 TB."""
    from pyspark.sql import functions as F

    from randas_spark.functions.text import quality_score
    from randas_spark.operators.sampling import importance_resample

    out = importance_resample(docs, "doc_id", quality_score(F.col("text")), 0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan.lower(), plan


def test_leakage_safe_split_respects_custom_fractions(spark):
    """fractions are cumulative md5 thresholds: a 100/0 split labels
    everything train; a 0-threshold first bucket labels nothing train.
    Pure function of cluster id — no RNG to seed."""
    from pyspark.sql import functions as F

    from randas_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    all_train = leakage_safe_split(df, pairs, "doc_id", fractions=(("train", 1.0),))
    assert {r["split"] for r in all_train.collect()} == {"train"}
    none_train = leakage_safe_split(
        df, pairs, "doc_id", fractions=(("train", 0.0),), final="rest"
    )
    assert {r["split"] for r in none_train.collect()} == {"rest"}


def test_importance_resample_zero_weight_corpus_degrades_to_uniform(spark):
    """Σwq == 0 (all weights quantize to zero) must degrade to a
    uniform hash sample at target_frac — NOT keep everything (the raw
    0/0 rate is NaN and Spark's least(1.0, NaN) is 1.0, which would
    silently disable the sampler). Negative weights clamp to zero."""
    from pyspark.sql import functions as F

    from randas_spark.operators.sampling import hash_sample, importance_resample

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    kept = importance_resample(df, "doc_id", F.lit(1e-9), target_frac=0.3)
    n = kept.count()
    assert n < 400, "Σw=0 must not keep the whole corpus"
    assert 0.15 * 400 <= n <= 0.45 * 400

    neg = importance_resample(df, "doc_id", F.lit(-5.0), target_frac=0.3)
    assert neg.count() == n  # clamped to the same zero-signal fallback


def test_poisson_bootstrap_ci_is_sane_and_deterministic(docs, spark):
    """llm_bootstrap_ci statistical pins: (1) deterministic — two runs
    produce identical replicate means (md5 weights, no RNG state);
    (2) the replicate-mean distribution centers on the plain corpus
    mean (each Poisson(1) weight has E[w]=1) — the grand mean lies
    within 3 bootstrap-sigma of the plain mean and the 95% CI contains
    it; (3) n_eff per replicate is within 20% of N; (4) the CI bounds
    are genuine order statistics: ci_lo <= median replicate <= ci_hi
    and roughly 95% of replicate means fall inside."""
    import statistics

    from pyspark.sql import functions as F
    from randas_spark.functions.text import quality_score
    from randas_spark.queries import REGISTRY, load_all

    load_all()
    fn = REGISTRY["llm_bootstrap_ci"].fn
    rows1 = sorted(fn(spark, SF).collect(), key=lambda r: r.b)
    rows2 = sorted(fn(spark, SF).collect(), key=lambda r: r.b)
    assert [(r.b, r.n_eff, r.mean_q) for r in rows1] == [
        (r.b, r.n_eff, r.mean_q) for r in rows2
    ]
    assert len(rows1) == 200

    d = docs.select(
        (F.floor(quality_score(F.col("text")) * 1_000_000 + F.lit(0.5)))
        .cast("long")
        .alias("sc")
    )
    agg = d.agg(F.sum("sc").alias("s"), F.count(F.lit(1)).alias("n")).first()
    plain_mean = agg.s / agg.n / 1_000_000.0
    n = agg.n

    means = [r.mean_q for r in rows1]
    lo, hi = rows1[0].ci_lo, rows1[0].ci_hi
    sigma = statistics.pstdev(means)
    assert abs(statistics.mean(means) - plain_mean) <= 3 * sigma + 1e-9
    assert lo <= plain_mean <= hi
    assert all(abs(r.n_eff - n) <= 0.2 * n for r in rows1)
    inside = sum(1 for m in means if lo <= m <= hi)
    assert inside >= 0.9 * len(means)
    assert lo <= statistics.median(means) <= hi
