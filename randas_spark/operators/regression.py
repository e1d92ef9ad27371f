"""Distributed closed-form regression via exact Gram-matrix aggregation.

Classic scale-out analytics: an OLS fit over N rows needs only the
O(d^2) Gram sums (X^T X, X^T y), which Spark computes in ONE scan with
map-side partial aggregation — no iteration, no driver-side data, and
the shuffle carries |groups| x O(d^2) cells regardless of N. At 100 TB
the plan is a single map-combined groupBy; the per-group solve is a
constant-size expression evaluated inside codegen.

Cross-engine determinism (the oracle story): float summation order
differs between engines, so the Gram sums are accumulated over
SCALED INTEGER features (floor(x * scale + 0.5) as BIGINT) — integer
addition is associative, so Spark and DuckDB produce bit-equal sums,
and the downstream double-precision Cramer solve is the same IEEE op
sequence on both sides (conversion of the same exact integer to double
rounds identically on both engines even past 2^53).

Overflow budget (Spark sums in int64 and wraps silently in non-ANSI
mode, so the scales must be sized to the data): the dominant cell is
sum(y_s^2) <= N * (y_max * scale_y)^2. With y_max ~ 1.05e5 and
scale_y = 10 that is ~6.6e18 at N = 6e6 (sf1) — inside int64. Past
that, switch the sum cells to DECIMAL(38,0): same associativity
argument, exact at any N. The reference engine (dataframe.rs:186-353)
stops at scalar aggregates; closed-form model fitting is the natural
next rung for an analytics engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: str, scale: int) -> Column:
    """floor(x*scale + 0.5) as BIGINT — the fround integerization, kept
    identical to the SQL oracle so both engines sum the same integers."""
    return F.floor(F.col(col) * scale + F.lit(0.5)).cast("long")


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x1: str,
    x2: str,
    y: str,
    scale_x: int = 1000,
    scale_y: int = 10,
    digits: int = 4,
) -> DataFrame:
    """Per-group OLS fit of ``y ~ b0 + b1*x1 + b2*x2`` plus R^2.

    One map-side-combined aggregation produces the 10 Gram sums per
    group; the 3x3 normal equations are solved in-row by Cramer's rule
    (closed form, no iteration). Returns one row per group:
    ``(groups..., n, b0, b1, b2, r2)`` with coefficients rounded via the
    engine-portable fround formula.

    Determinism: sums run over scaled int64 (exact, order-independent);
    the solve runs on doubles derived from those exact sums with a fixed
    expression shape mirrored verbatim in :func:`sql_grouped_ols`.
    """
    from randas_spark.queries import fround

    sx1, sx2 = _scaled(x1, scale_x), _scaled(x2, scale_x)
    sy = _scaled(y, scale_y)
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(sx1).alias("s1"),
        F.sum(sx2).alias("s2"),
        F.sum(sy).alias("sy"),
        F.sum(sx1 * sx1).alias("s11"),
        F.sum(sx1 * sx2).alias("s12"),
        F.sum(sx2 * sx2).alias("s22"),
        F.sum(sx1 * sy).alias("s1y"),
        F.sum(sx2 * sy).alias("s2y"),
        F.sum(sy * sy).alias("syy"),
    )
    kx, ky = float(scale_x), float(scale_y)
    # Unscale the exact integer sums into doubles. Each Gram cell divides
    # by the product of its factors' scales; identical constants +
    # identical division order on the oracle side give bit-equal doubles.
    n = F.col("n").cast("double")
    a1 = F.col("s1") / kx
    a2 = F.col("s2") / kx
    ay = F.col("sy") / ky
    a11 = F.col("s11") / (kx * kx)
    a12 = F.col("s12") / (kx * kx)
    a22 = F.col("s22") / (kx * kx)
    a1y = F.col("s1y") / (kx * ky)
    a2y = F.col("s2y") / (kx * ky)
    ayy = F.col("syy") / (ky * ky)
    # Cramer's rule on [[n,a1,a2],[a1,a11,a12],[a2,a12,a22]] b = [ay,a1y,a2y]
    det = (
        n * (a11 * a22 - a12 * a12)
        - a1 * (a1 * a22 - a12 * a2)
        + a2 * (a1 * a12 - a11 * a2)
    )
    b0 = (
        ay * (a11 * a22 - a12 * a12)
        - a1 * (a1y * a22 - a12 * a2y)
        + a2 * (a1y * a12 - a11 * a2y)
    ) / det
    b1 = (
        n * (a1y * a22 - a12 * a2y)
        - ay * (a1 * a22 - a12 * a2)
        + a2 * (a1 * a2y - a1y * a2)
    ) / det
    b2 = (
        n * (a11 * a2y - a1y * a12)
        - a1 * (a1 * a2y - a1y * a2)
        + ay * (a1 * a12 - a11 * a2)
    ) / det
    sse = ayy - b0 * ay - b1 * a1y - b2 * a2y
    sst = ayy - ay * ay / n
    r2 = F.lit(1.0) - sse / sst
    return g.select(
        *group_cols,
        F.col("n"),
        fround(b0, digits).alias("b0"),
        fround(b1, digits).alias("b1"),
        fround(b2, digits).alias("b2"),
        fround(r2, digits).alias("r2"),
    )


def sql_grouped_ols(
    table_expr: str,
    group_cols: list[str],
    x1: str,
    x2: str,
    y: str,
    scale_x: int = 1000,
    scale_y: int = 10,
    digits: int = 4,
) -> str:
    """DuckDB twin of :func:`grouped_ols` — same scaled-integer sums,
    same Cramer expression shape, same fround, so the value hash matches
    bit-for-bit. (DuckDB sums BIGINT into HUGEINT; the values are the
    same exact integers Spark holds in int64 within the overflow budget,
    and int->double conversion rounds identically from either width.)"""
    from randas_spark.queries import sql_fround

    gc = ", ".join(group_cols)
    kx, ky = float(scale_x), float(scale_y)
    sq = f"CAST(floor({x1} * {scale_x} + 0.5) AS BIGINT)"
    sd = f"CAST(floor({x2} * {scale_x} + 0.5) AS BIGINT)"
    sy = f"CAST(floor({y} * {scale_y} + 0.5) AS BIGINT)"
    det = (
        "(n * (a11 * a22 - a12 * a12)"
        " - a1 * (a1 * a22 - a12 * a2)"
        " + a2 * (a1 * a12 - a11 * a2))"
    )
    b0 = (
        "((ay * (a11 * a22 - a12 * a12)"
        " - a1 * (a1y * a22 - a12 * a2y)"
        " + a2 * (a1y * a12 - a11 * a2y)) / det)"
    )
    b1 = (
        "((n * (a1y * a22 - a12 * a2y)"
        " - ay * (a1 * a22 - a12 * a2)"
        " + a2 * (a1 * a2y - a1y * a2)) / det)"
    )
    b2 = (
        "((n * (a11 * a2y - a1y * a12)"
        " - a1 * (a1 * a2y - a1y * a2)"
        " + ay * (a1 * a12 - a11 * a2)) / det)"
    )
    return f"""
    WITH sums AS (
        SELECT {gc},
               CAST(count(*) AS BIGINT) AS cnt,
               sum({sq}) AS s1, sum({sd}) AS s2, sum({sy}) AS sy0,
               sum({sq} * {sq}) AS s11, sum({sq} * {sd}) AS s12,
               sum({sd} * {sd}) AS s22, sum({sq} * {sy}) AS s1y,
               sum({sd} * {sy}) AS s2y, sum({sy} * {sy}) AS syy
        FROM {table_expr} GROUP BY {gc}
    ),
    un AS (
        SELECT {gc}, cnt,
               CAST(cnt AS DOUBLE) AS n,
               s1 / {kx} AS a1, s2 / {kx} AS a2, sy0 / {ky} AS ay,
               s11 / ({kx} * {kx}) AS a11, s12 / ({kx} * {kx}) AS a12,
               s22 / ({kx} * {kx}) AS a22, s1y / ({kx} * {ky}) AS a1y,
               s2y / ({kx} * {ky}) AS a2y, syy / ({ky} * {ky}) AS ayy
        FROM sums
    ),
    solved AS (
        SELECT {gc}, cnt, n, ay, a1y, a2y, ayy, {det} AS det,
               a1, a2, a11, a12, a22
        FROM un
    ),
    coefs AS (
        SELECT {gc}, cnt, n, ay, a1y, a2y, ayy,
               {b0} AS b0, {b1} AS b1, {b2} AS b2
        FROM solved
    )
    SELECT {gc}, cnt AS n,
           {sql_fround('b0', digits)} AS b0,
           {sql_fround('b1', digits)} AS b1,
           {sql_fround('b2', digits)} AS b2,
           {sql_fround('1.0 - (ayy - b0 * ay - b1 * a1y - b2 * a2y) / (ayy - ay * ay / n)', digits)} AS r2
    FROM coefs
    """
