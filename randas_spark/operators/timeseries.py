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

from collections.abc import Iterator

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
    out_schema = f"{key} long, {ts_col} timestamp, {value_col} double, ewma double"

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
