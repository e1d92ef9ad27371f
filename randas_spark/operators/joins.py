"""Temporal join operators: as-of join and time-bucketed range join.

Spark has no native ASOF JOIN (the reference has no joins at all —
SURVEY.md §2.12). The classic naive formulation (non-equi join + argmax)
explodes to |L|×|R| pairs per key before filtering; at 100 TB that's the
difference between a join and an outage. Both operators here avoid pair
explosion by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    direction: str = "backward",
    suffix: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction="backward"; "forward" = earliest
    right row with ``right.ts >= left.ts``), matched within the ``on`` key.

    Right payload columns that collide with a left column are renamed
    with ``suffix`` (pandas merge_asof's suffixes behavior); without a
    suffix a collision raises — the union construction below would
    otherwise silently null-out the left values.

    ``tolerance`` (an INTERVAL literal, e.g. "2 hours") nulls the
    attached payload when the matched row is farther than that from the
    left timestamp — pandas merge_asof's tolerance semantics (the
    nearest candidate is the only one that could qualify, so
    match-then-null is exact, not an approximation). Costs one extra
    carried column (the matched ts), no extra shuffle.

    Implementation: union both sides tagged, one window per key ordered by
    (ts, side), and ``last(struct(ts, payload), ignorenulls=True)`` carries
    the nearest right ROW (timestamp + payload together, so a NULL payload
    field on the nearest row is returned as NULL, never an older row's
    value) forward onto left rows. Right rows sort before left rows at
    equal ts, so an exact-ts match counts (<=), mirroring DuckDB ASOF.

    Scale: ONE hash shuffle on the key + an in-partition sort — the same
    cost as a regular sort-merge join, with no intermediate pair blow-up.
    Rows per key stay linear; skewed keys are handled by AQE like any
    window. Ties at identical (key, ts) on the right side are broken by
    window order (undefined among exact duplicates — callers needing total
    determinism should dedup or add a tiebreak column to ``ts`` ordering).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    shared = [
        c for c in right.columns if c not in (on, ts) and c in set(left.columns)
    ]
    if shared:
        if suffix is None:
            raise ValueError(
                f"asof_join: right payload columns {shared} collide with left "
                "columns; pass suffix='_right' (or similar) to rename them"
            )
        taken = set(left.columns) | set(right.columns)
        for c in shared:
            if c + suffix in taken:
                raise ValueError(
                    f"asof_join: suffixed name {c + suffix!r} already exists; "
                    "pick a different suffix"
                )
        right = right.select(
            *[
                F.col(c).alias(c + suffix) if c in shared else F.col(c)
                for c in right.columns
            ]
        )

    payload = [c for c in right.columns if c not in (on, ts)]
    left_only = [c for c in left.columns if c not in (on, ts)]

    # single projection per side (a withColumn loop builds one Project
    # node PER COLUMN — the wide-schema analysis-time anti-pattern)
    l2 = left.select(
        "*",
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    r2 = right.select(
        "*",
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
    )

    cols = [on, ts, _SIDE, *left_only, *payload]
    u = l2.select(cols).unionByName(r2.select(cols))

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).desc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    # Carry the whole nearest right ROW as one struct (non-null for every
    # right row even when individual payload fields are NULL), so payload
    # values and the matched timestamp always come from the SAME row —
    # per-column last(ignorenulls) could pair an older column value with a
    # newer row's ts when the nearest row holds a NULL, diverging from
    # pandas merge_asof / DuckDB ASOF nearest-row semantics.
    rrow = F.last(
        F.when(
            F.col(_SIDE) == 0,
            F.struct(F.col(ts).alias("__rts__"), *[F.col(c) for c in payload]),
        ),
        ignorenulls=True,
    ).over(w).alias("__rrow__")

    out = u.select(on, ts, _SIDE, *left_only, rrow).filter(F.col(_SIDE) == 1)
    carried = [F.col("__rrow__")[c].alias(c) for c in payload]

    if tolerance is None:
        return out.select(on, ts, *left_only, *carried)

    rts = F.col("__rrow__")["__rts__"]
    gap = rts - F.col(ts) if direction == "forward" else F.col(ts) - rts
    within = rts.isNotNull() & (gap <= F.expr(f"INTERVAL {tolerance}"))
    gated = [F.when(within, F.col("__rrow__")[c]).alias(c) for c in payload]
    return out.select(on, ts, *left_only, *gated)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    right_ts: str,
    lower: Column,
    upper: Column,
    bucket_seconds: int,
    on: str | None = None,
) -> DataFrame:
    """Range join ``right_ts BETWEEN lower AND upper`` without (or with) an
    equi key, bucketized so Spark gets an equi-join condition.

    Each left row joins buckets [floor(lower/b) .. floor(upper/b)] via a
    compact explode; the exact range predicate filters post-join. Choose
    ``bucket_seconds`` ≈ the typical window width so each row lands in
    O(1) buckets. Turns a BroadcastNestedLoopJoin (cartesian — unusable at
    scale) into a hash join on (key, bucket).
    """
    b = F.lit(bucket_seconds)
    lo_b = F.floor(F.unix_micros(lower) / (b * 1_000_000))
    hi_b = F.floor(F.unix_micros(upper) / (b * 1_000_000))
    l2 = left.withColumn("__bucket__", F.explode(F.sequence(lo_b, hi_b))).withColumn(
        "__lo__", lower
    ).withColumn("__hi__", upper)
    r2 = right.withColumn(
        "__bucket__", F.floor(F.unix_micros(F.col(right_ts)) / (bucket_seconds * 1_000_000))
    )
    # r2[right_ts], not F.col(right_ts): an unqualified reference is
    # AMBIGUOUS when both sides share the timestamp column name (the
    # natural 'ts'/'ts' call)
    cond = (l2["__bucket__"] == r2["__bucket__"]) & (
        (r2[right_ts] >= F.col("__lo__")) & (r2[right_ts] <= F.col("__hi__"))
    )
    if on is not None:
        cond = cond & (l2[on] == r2[on])
    joined = l2.join(r2, cond, "inner")
    if on is not None:
        # keep ONE copy of the equi key — two same-named columns make
        # every downstream reference ambiguous
        joined = joined.drop(r2[on])
    return joined.drop("__bucket__", "__lo__", "__hi__")
