"""Distributed clustering over embedding columns.

Beyond the reference surface (randas has no vector ops — SURVEY.md §2
closes at frame ops): clustering is the corpus-curation primitive behind
diversity sampling, topic balancing, and SemDeDup-style pruning at
training-data scale. The design target is the MLlib-KMeans execution
shape (broadcast centroids, one shuffle per iteration, k×dim driver
state) with one extra property MLlib doesn't give: full cross-engine
determinism, so the whole fit carries a DuckDB value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from randas_spark.operators.sampling import _md5_hex


def _quantize(vec: Column, scale: float) -> Column:
    """Global fixed-scale integer quantization: floor(x*scale + 0.5) as
    long. Unlike quantize_int8's per-vector scale (which cancels in
    cosine but NOT in L2), one global scale preserves relative L2
    distances exactly, and integer coordinates make every cross-row sum
    in the centroid update EXACT — the one place float accumulation
    order would otherwise make a distributed k-means nondeterministic.
    floor(x+0.5) (not round) because Spark and DuckDB round() disagree
    at .xx5."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast(
            "long"
        ),
    )


def kmeans_lloyd_det(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 4,
    scale: float = 512.0,
    stats: dict | None = None,
) -> DataFrame:
    """(id, cluster, dist) after ``n_iter`` deterministic Lloyd rounds.

    Every source of nondeterminism in a naive distributed k-means is
    closed off:

    - **Seeding**: the k vectors with the lowest md5(id) — a
      reproducible uniform sample (same discipline as knn_ivf_det);
      cluster labels are the seed ids.
    - **Accumulation**: vectors are globally quantized to integers, so
      per-cluster coordinate sums are exact longs whatever the shuffle
      order; centroid coordinates are then one correctly-rounded IEEE
      division each (sum/count), bit-identical on any engine.
    - **Assignment**: squared-L2 argmin with (dist, cluster) lexicographic
      tie-break; the distance fold runs in array-index order on both
      engines.

    Execution shape (the MLlib-KMeans plan, by design): the quantized
    corpus is materialized once; centroids live driver-side (k×dim
    doubles — the standard iterative-algorithm state, NOT a data
    collect) and enter each assignment as broadcast literals, so
    assignment is a zero-shuffle projection; the centroid update is ONE
    shuffle of (cluster, pos) partial sums with map-side combine. Per
    iteration: one scan + one narrow shuffle, state O(k·dim). At 100 TB
    swap the localCheckpoint for a DISK persist; nothing else changes.

    Empty clusters keep their previous centroid (deterministic, and what
    a production fit does rather than re-seeding mid-run).

    ``dist`` is squared L2 in QUANTIZED space — scale² × the squared
    distance on the rounded grid (262,144× at the default scale 512);
    compare dists to each other or divide by scale² before applying an
    embedding-space threshold. Vectors must be fixed-dimension and
    null-free: a null element would be skipped by the integer sum while
    the row still counts, silently dragging that centroid coordinate
    toward zero.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = df.select(
        F.col(id_col).alias("vid"), _quantize(F.col(vec_col), scale).alias("qx")
    ).localCheckpoint()

    seed_rows = (
        v.orderBy(_md5_hex(F.col("vid")), F.col("vid"))
        .limit(k)
        .select(F.col("vid").alias("cluster"), "qx")
        .collect()
    )
    cents: list[tuple[int, list[float]]] = sorted(
        (r["cluster"], [float(x) for x in r["qx"]]) for r in seed_rows
    )
    if not cents:
        raise ValueError("kmeans_lloyd_det: input DataFrame is empty")

    def assign(cents: list[tuple[int, list[float]]]) -> DataFrame:
        def dist_to(carr: list[float]) -> Column:
            lit = F.array(*[F.lit(m) for m in carr])
            return F.aggregate(
                F.zip_with(
                    F.col("qx"),
                    lit,
                    lambda x, m: (x.cast("double") - m) * (x.cast("double") - m),
                ),
                F.lit(0.0),
                lambda acc, d: acc + d,
            )

        # cluster labels keep the seed id's natural literal type (long
        # ids stay long, string ids stay string — a cast-to-long here
        # would null out non-numeric ids); F.least needs >= 2 args, so
        # a single surviving centroid short-circuits to its struct.
        structs = [
            F.struct(dist_to(carr).alias("d"), F.lit(c).alias("c"))
            for c, carr in cents
        ]
        best = structs[0] if len(structs) == 1 else F.least(*structs)
        return v.withColumn("best", best).select(
            "vid",
            "qx",
            F.col("best.c").alias("cluster"),
            F.col("best.d").alias("dist"),
        )

    assigned = assign(cents)
    for it in range(n_iter - 1):
        sums = (
            assigned.select("cluster", F.posexplode("qx").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        acc: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            acc.setdefault(r["cluster"], {})[r["pos"]] = (r["s"], r["cnt"])
        cents = [
            (
                c,
                [acc[c][p][0] / acc[c][p][1] for p in range(len(prev))]
                if c in acc
                else prev,
            )
            for c, prev in cents
        ]
        assigned = assign(cents)

    if stats is not None:
        stats["centroids"] = dict(cents)
    return assigned.select(F.col("vid").alias(id_col), "cluster", "dist")
