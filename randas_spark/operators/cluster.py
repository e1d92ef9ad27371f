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
    # NO fan_out here (r13): the pre-kernel fit needed core-count
    # parallelism because the interpreted HOF argmin burned CPU per row;
    # the numpy kernel doesn't — and fan_out only ever fires on
    # single-split inputs, which parquet splitting caps near
    # maxPartitionBytes (~128 MB), trivially inside one vectorized task.
    # Fanning the bench's 2000-row corpus to 32 partitions made every
    # per-iteration kernel job pay 32 task+Arrow round trips: measured
    # 0.79 s/job at 32 parts vs 0.37 s at 1 (OPTIMIZATION_r13.md). At
    # cluster scale inputs arrive many-split and partitioning is
    # untouched either way.
    v = df.select(
        F.col(id_col).alias("vid"), _quantize(F.col(vec_col), scale).alias("qx")
    ).localCheckpoint()
    id_type = df.schema[id_col].dataType.simpleString()

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

    def _dist_matrix(x_long, cmat):
        """Strict per-dimension left fold, vectorized over (row, centroid):
        acc = acc + (x_j - m_j) * (x_j - m_j) — one IEEE sub, one mul, one
        add rounding per step, the exact sequence of the retired
        F.aggregate(zip_with(...)) fold and of the DuckDB oracle's
        list_reduce, so distances (and therefore argmin labels and
        tie-breaks) are bit-identical cross-engine. NO np.sum / einsum —
        pairwise summation would round differently."""
        import numpy as np

        xd = x_long.astype(np.float64)  # |qx| << 2^53: exact
        acc = np.zeros((xd.shape[0], cmat.shape[0]))
        for j in range(xd.shape[1]):
            diff = xd[:, j : j + 1] - cmat[:, j]
            acc += diff * diff
        return acc

    def assign(cents: list[tuple[int, list[float]]]) -> DataFrame:
        """(vid, cluster, dist) via a vectorized Arrow kernel — the
        assign_topk_cells pattern (similarity.py) applied to the L2
        argmin: the k x dim centroid panel ships in the closure (bounded
        model state), each Arrow batch is scored with the strict fold
        above, and argmin's first-occurrence rule IS the (dist, cluster)
        lexicographic tie-break because ``cents`` is sorted ascending by
        label (Python code-point order == Spark UTF8 binary order). The
        retired F.least-of-structs projection computed the same argmin
        but as an interpreted per-row HOF chain (zero codegen spans,
        k x dim fold ops per row in the Catalyst interpreter). Cluster
        labels keep the seed id's natural type (long ids stay long,
        string ids stay string)."""
        labels = [c for c, _ in cents]
        panel = [list(carr) for _, carr in cents]

        def _assign_batches(pdfs):
            import numpy as np
            import pandas as pd

            cmat = np.array(panel, dtype=np.float64)
            for pdf in pdfs:
                if not len(pdf):
                    continue
                x = np.stack([np.asarray(a, dtype=np.int64) for a in pdf["qx"]])
                d = _dist_matrix(x, cmat)
                best = d.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "vid": pdf["vid"].values,
                        "cluster": [labels[j] for j in best],
                        "dist": d[np.arange(len(best)), best],
                    }
                )

        return v.mapInPandas(
            _assign_batches, schema=f"vid {id_type}, cluster {id_type}, dist double"
        )

    def update_sums(cents: list[tuple[int, list[float]]]):
        """Per-cluster coordinate sums/counts for the centroid update as
        one kernel pass: each Arrow batch re-derives the argmin (same
        strict fold) and emits its k x dim partial (cluster, pos, s, cnt)
        grid — exact int64 partials, associative, so the downstream
        groupBy sums are order-free. Replaces the posexplode of N x dim
        rows (the old update shuffled every coordinate as its own row
        through an interpreted Generate; partials shuffle ~n_tasks x k x
        dim rows instead)."""
        labels = [c for c, _ in cents]
        panel = [list(carr) for _, carr in cents]

        def _sum_batches(pdfs):
            import numpy as np
            import pandas as pd

            cmat = np.array(panel, dtype=np.float64)
            kk, dim = cmat.shape
            for pdf in pdfs:
                if not len(pdf):
                    continue
                x = np.stack([np.asarray(a, dtype=np.int64) for a in pdf["qx"]])
                best = _dist_matrix(x, cmat).argmin(axis=1)
                idx = np.flatnonzero(np.bincount(best, minlength=kk))
                s = np.zeros((len(idx), dim), dtype=np.int64)
                cnt = np.zeros(len(idx), dtype=np.int64)
                for out_i, ci in enumerate(idx):
                    m = best == ci
                    s[out_i] = x[m].sum(axis=0)
                    cnt[out_i] = int(m.sum())
                yield pd.DataFrame(
                    {
                        "cluster": np.repeat([labels[j] for j in idx], dim),
                        "pos": np.tile(np.arange(dim), len(idx)),
                        "s": s.reshape(-1),
                        "cnt": np.repeat(cnt, dim),
                    }
                )

        part = v.mapInPandas(
            _sum_batches, schema=f"cluster {id_type}, pos int, s long, cnt long"
        )
        return (
            part.groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
            .collect()
        )

    for it in range(n_iter - 1):
        sums = update_sums(cents)
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

    if stats is not None:
        stats["centroids"] = dict(cents)
    return assign(cents).select(F.col("vid").alias(id_col), "cluster", "dist")
