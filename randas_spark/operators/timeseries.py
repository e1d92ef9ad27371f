"""Time-series operators: resample, dense spine + gap-fill, EWMA.

The reference has no time/date operators at all (its DateTime variant is
never even produced by a reader — SURVEY.md §1.2); these cover the
standard time-series shapes an events pipeline needs:

- :func:`resample` — downsample to fixed buckets (date_trunc + agg).
- :func:`gap_fill_ffill` — upsample onto a DENSE per-key time spine
  (missing buckets materialized), then forward-fill the last observed
  value with ``last(..., ignorenulls=True)`` over an ordered window.
- :func:`ewma_by_key` — exponentially weighted moving average per key,
  an inherently sequential recurrence (y_t = α·x_t + (1-α)·y_{t-1}), via
  Arrow-batched ``applyInPandas``.

Scale notes:
- resample is one shuffle on (key, bucket) with map-side partial agg.
- gap_fill: the spine is |keys| × |buckets| rows built from sequence()+
  explode (no driver loop); the left join and the forward-fill window
  both partition by key, so AQE reuses one exchange. Bucket count is
  bounded by the time range, not the row count — safe at 100 TB as long
  as range/granularity is sane (a year of hours = 8.8k buckets/key).
- ewma: applyInPandas holds ONE key's series in memory per task. For
  keys with unbounded history, segment the series and stitch with the
  closed-form carry-in (y across segments is a geometric carry:
  y_seg = w·y_prev_end + ewma_local), or run it incrementally under
  applyInPandasWithState on the stream (streaming/engine.py).
"""

from __future__ import annotations


import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    unit: str,
    aggs: list[Column],
) -> DataFrame:
    """Fixed-bucket downsample: date_trunc(unit) + groupBy + aggs."""
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket_start")
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(*aggs)


def gap_fill_ffill(
    df: DataFrame,
    ts_col: str,
    key: str,
    unit: str,
    value: Column,
    filled_name: str = "filled_value",
) -> DataFrame:
    """Dense per-key spine at ``unit`` granularity with forward-filled
    values; emits (key, bucket_start, n_events, filled).

    Buckets with no rows appear with n_events=0 and the last observed
    value carried forward (null until the key's first observation —
    nothing is invented before data exists).
    """
    bucketed = (
        df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("h"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"), value.alias("__v__"))
    )
    _INTERVAL_UNITS = {
        "year", "month", "week", "day", "hour", "minute", "second",
        "millisecond", "microsecond",
    }
    if unit.lower() not in _INTERVAL_UNITS:
        raise ValueError(
            f"unit {unit!r} is not a valid interval unit "
            f"(use one of {sorted(_INTERVAL_UNITS)}; 'quarter'/'mon'/'dd' "
            "work for date_trunc but not for the spine step)"
        )
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("mn"),
        F.date_trunc(unit, F.max(ts_col)).alias("mx"),
    )
    spine = (
        df.select(key)
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            key,
            F.explode(
                # date_trunc accepts aliases ('mon', 'dd', 'quarter') that
                # interval literals reject — validate up front so the
                # error names the fix instead of a plan-time
                # ParseException
                F.sequence("mn", "mx", F.expr(f"INTERVAL 1 {unit}"))
            ).alias("h"),
        )
    )
    w = Window.partitionBy(key).orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(bucketed, [key, "h"], "left")
        .select(
            F.col(key),
            F.col("h").alias("bucket_start"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("__v__", ignorenulls=True).over(w).alias(filled_name),
        )
    )


def ewma_by_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    id_col: str | None = None,
) -> DataFrame:
    """Per-key EWMA over event-time order: y_t = α·x_t + (1-α)·y_{t-1}.

    A sequential recurrence no window frame expresses (each output
    depends on ALL priors with geometric weights), so it runs as a
    grouped-map Pandas op — one Arrow batch per key, vectorized inside.
    Ties on ts break by id_col for determinism.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0,1], got {alpha}")
    order = [ts_col] + ([id_col] if id_col else [])
    # derive the output schema from the INPUT dtypes — hardcoded
    # "long/timestamp/double" broke any frame whose key is a string or
    # whose value is int (Arrow cast error at runtime)
    dts = dict(df.dtypes)
    out_schema = (
        f"{key} {dts[key]}, {ts_col} {dts[ts_col]}, "
        f"{value_col} {dts[value_col]}, ewma double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        ew = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame(
            {
                key: pdf[key],
                ts_col: pdf[ts_col],
                value_col: pdf[value_col],
                "ewma": ew,
            }
        )

    cols = [key, ts_col, value_col] + ([id_col] if id_col else [])
    return df.select(*cols).groupBy(key).applyInPandas(kernel, out_schema)


# --------------------------------------------------------------------------
# similarity search over per-key series (GEMINI lower-bound prune)
# --------------------------------------------------------------------------


def hourly_profile(df: DataFrame, key: str, ts_col: str) -> DataFrame:
    """(key, series): each key's activity as a 24-slot hour-of-day count
    vector — the fixed-length series similarity search needs. Built as
    24 conditional sums in ONE groupBy (single shuffle, map-side partial
    agg; no pivot, no window), so the construction is a plain aggregate
    at any scale."""
    hr = F.hour(F.col(ts_col))
    return df.groupBy(key).agg(
        F.array(
            *[
                F.sum(F.when(hr == h, 1).otherwise(0)).cast("double")
                for h in range(24)
            ]
        ).alias("series")
    )


def znorm(arr, n: int):
    """Z-normalized copy of a fixed-length array column: (v - mean)/std
    with a 1e-9 std floor (constant series map to all-zeros instead of
    NaN). Population std — mirror any SQL twin exactly."""
    mean = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v) / n
    var = (
        F.aggregate(arr, F.lit(0.0), lambda a, v: a + (v - mean) * (v - mean)) / n
    )
    std = F.greatest(F.sqrt(var), F.lit(1e-9))
    return F.transform(arr, lambda v: (v - mean) / std)


def zdist(a, b):
    """Euclidean distance between two equal-length array columns."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def paa(arr, n: int, segments: int):
    """Piecewise Aggregate Approximation: per-segment means of an
    n-length array (n divisible by segments). The classic dimensionality
    reduction for series indexing (Keogh et al.); with z-normalized
    input, sqrt(w)·dist(paa_a, paa_b) LOWER-BOUNDS the true Euclidean
    distance (the GEMINI containment guarantee), so PAA-space pruning
    never drops a true match."""
    w = n // segments
    if w * segments != n:
        raise ValueError(f"segments={segments} must divide n={n}")
    return F.transform(
        F.sequence(F.lit(0), F.lit(segments - 1)),
        lambda j: F.aggregate(
            F.slice(arr, j * w + 1, w), F.lit(0.0), lambda a, v: a + v
        )
        / w,
    )


def ts_range_search(
    series_df: DataFrame,
    key: str,
    query_key,
    radius: float,
    n: int = 24,
    segments: int = 6,
) -> DataFrame:
    """All keys whose z-normalized series lies within ``radius`` of the
    query key's series — lossless PAA-pruned range search (REPOSE/
    Odyssey-style distributed series search, GEMINI framework):

    1. z-normalize every series; broadcast the query's.
    2. PAA lower bound sqrt(w)·dist(paa, paa_q) computed per key — rows
       with LB > radius are pruned WITHOUT ever computing the full
       distance (at real series lengths the exact distance is the
       expensive part; the prune is the scale story).
    3. exact distance only for survivors; filter dist <= radius.

    Lossless because LB <= true distance for every pair. Returns
    (key, dist) excluding the query itself.
    """
    w = n // segments
    # mean/std staged as projected COLUMNS, then referenced as plain
    # attributes inside the transform lambda — inlining znorm()'s Column
    # form here would re-expand the mean subtree per array element and
    # the whole aggregate subtree again for std (HOF lambdas sit outside
    # codegen subexpression elimination; same lesson as the SimHash
    # single-pass rewrite), ballooning compile time and per-row work
    z = (
        series_df.withColumn(
            "mu", F.aggregate(F.col("series"), F.lit(0.0), lambda a, v: a + v) / n
        )
        .withColumn(
            "sd",
            F.greatest(
                F.sqrt(
                    F.aggregate(
                        F.col("series"),
                        F.lit(0.0),
                        lambda a, v: a + (v - F.col("mu")) * (v - F.col("mu")),
                    )
                    / n
                ),
                F.lit(1e-9),
            ),
        )
        .select(
            F.col(key),
            F.transform(
                F.col("series"), lambda v: (v - F.col("mu")) / F.col("sd")
            ).alias("z"),
        )
    )
    q = z.filter(F.col(key) == query_key).select(
        F.col("z").alias("qz"), paa(F.col("z"), n, segments).alias("qp")
    )
    if q.limit(1).count() == 0:
        # an absent query key would otherwise return an EMPTY result
        # indistinguishable from "no neighbors within radius"
        raise KeyError(f"ts_range_search: query_key {query_key!r} not found")
    cand = (
        z.filter(F.col(key) != query_key)
        .crossJoin(F.broadcast(q))
        .withColumn("lb", F.sqrt(F.lit(float(w))) * zdist(paa(F.col("z"), n, segments), F.col("qp")))
        .filter(F.col("lb") <= radius)
    )
    return (
        cand.withColumn("dist", zdist(F.col("z"), F.col("qz")))
        .filter(F.col("dist") <= radius)
        .select(F.col(key), F.col("dist"))
    )


SESSION_GAP_US = 1_800_000_000  # 30 min — the one sessionization gap


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Attach ``sess_id`` (per-user running session number, 1-based) via
    the lag/gap-flag/cumsum formulation: a row starts a new session when
    its gap to the previous event exceeds ``gap_us``. ONE (user_id)
    exchange serves both windows and any per-session aggregate stacked
    on top — the single shared definition both batch sessionization
    queries build on (the streaming twin is session_window)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    flagged = events.withColumn(
        "new_sess",
        F.when(micros - F.lag(micros).over(w) > gap_us, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn("sess_id", F.sum("new_sess").over(w2)).drop("new_sess")
