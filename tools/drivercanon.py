"""Driver-faithful correctness comparator.

The driver canonicalizes results with pandas (sort columns by name,
``sort_values`` over all columns, then hash the exact cell values) — it is
strictly stricter than tools/selfcheck.py's rounded text canon: a float
differing in the 12th digit, or an int column surfacing as int32 vs int64
object, flips the driver hash while passing selfcheck. This tool replicates
that discipline locally:

- pandas frames from ``DataFrame.toPandas()`` and ``duckdb.sql().df()``;
- columns sorted by name, rows lexsorted by every column (string render for
  the sort key so mixed/NaN columns don't throw);
- exact elementwise equality (NaN==NaN allowed), with first-diff reporting.

It also reproduces the driver's list-cell crash: a result with an unhashable
array column fails here the way it fails there.

Usage: python tools/drivercanon.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from randas_spark.session import TABLES  # single source of truth


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization. Raises TypeError on list cells the
    same way the driver's Categorical lexsort does."""
    df = df[sorted(df.columns)]
    if len(df):
        # The driver sorts with Categorical lexsort; factorize() throws the
        # identical TypeError on unhashable cells, so parity holds.
        for c in df.columns:
            if df[c].dtype == object:
                pd.factorize(df[c].to_numpy())
        # string-render sort key: mixed-type object columns (int + str
        # rows) are orderable the way the driver's Categorical codes are,
        # instead of raising on int < str
        # sort EVERY column through one canonical key: numeric columns
        # (and numeric-valued object columns, e.g. Decimal vs float64 for
        # the same logical data) order numerically on both sides, so an
        # object-vs-float dtype split cannot misalign the row order and
        # report spurious DIFFs on equal multisets
        def _k(col):
            if col.dtype != object:
                return col
            import numbers

            if col.map(lambda v: v is None or isinstance(v, numbers.Number)).all():
                return col.map(lambda v: float("nan") if v is None else float(v))
            return col.map(lambda v: str(v))

        df = df.sort_values(
            by=list(df.columns), kind="mergesort", key=_k
        ).reset_index(drop=True)
    return df


def dtype_mismatch(ds, do) -> str | None:
    """Driver-visible schema split between two pandas dtypes, or None.

    Dimensions the driver's canon distinguishes: numeric kind (int64 vs
    float64), datetime tz-awareness and tz identity, and datetime unit
    (s/ms/us/ns). Kinds outside those (object vs object) compare equal —
    the value pass covers them.
    """
    ks, ko = ds.kind, do.kind
    if ks == ko == "M":
        ts, to = getattr(ds, "tz", None), getattr(do, "tz", None)
        if (ts is None) != (to is None) or str(ts) != str(to):
            return "tz-awareness"
        # Datetime *unit* (ns vs us) is NOT a driver-visible split:
        # stream_tumbling_window was driver-green in r4 with Spark
        # datetime64[ns] vs DuckDB datetime64[us]. Only tz-awareness flips
        # the driver schema hash (the r4 stream_sliding_window red).
        return None
    if ks != ko:
        if {ks, ko} <= {"i", "u"}:
            return None  # int width/signedness: driver canon treats as equal ints
        if {ks, ko} <= {"i", "u", "f"}:
            return "int vs float"
        # object columns absorb strings/decimals/None on either side; a
        # concrete non-object kind against object is still a driver split
        # when it's datetime-vs-object? No — Spark surfaces date32 as
        # object while DuckDB gives datetime64; the value pass decides
        # those. Only flag unambiguous numeric/bool/datetime kind splits.
        if "O" in (ks, ko):
            return None
        return f"kind {ks} vs {ko}"
    return None


def cells_equal(a, b) -> bool:
    if a is None or b is None or a is pd.NaT or b is pd.NaT:
        return (a is None or a is pd.NaT) and (b is None or b is pd.NaT)
    fa = isinstance(a, (float, np.floating))
    fb = isinstance(b, (float, np.floating))
    if fa or fb:
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) or math.isnan(bf):
            return math.isnan(af) and math.isnan(bf)
        return af == bf
    if isinstance(a, pd.Timestamp) or isinstance(b, pd.Timestamp):
        ta = pd.Timestamp(a).tz_localize(None) if pd.Timestamp(a).tzinfo else pd.Timestamp(a)
        tb = pd.Timestamp(b).tz_localize(None) if pd.Timestamp(b).tzinfo else pd.Timestamp(b)
        return ta == tb
    if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
        return int(a) == int(b)
    return a == b


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame, max_diffs: int = 5) -> bool:
    ok = True
    if len(sdf) != len(odf):
        print(f"FAIL  {name}: rowcount spark={len(sdf)} duckdb={len(odf)}")
        return False
    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"FAIL  {name}: columns spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
        return False
    try:
        s = canon_frame(sdf)
        o = canon_frame(odf)
    except TypeError as ex:
        print(f"FAIL  {name}: driver canon would crash: {ex}")
        return False
    # The driver compares schemas on pandas dtypes before hashing values:
    # int-vs-float (DuckDB HUGEINT sums surface as float64), tz-aware vs
    # naive timestamps (DuckDB to_timestamp yields TIMESTAMPTZ →
    # datetime64[us, UTC] while Spark is naive — the r4
    # stream_sliding_window red), and datetime resolution all flip it even
    # when every value agrees. Fail on any of those here so local PASS
    # implies driver pass.
    for c in s.columns:
        m = dtype_mismatch(s[c].dtype, o[c].dtype)
        if m:
            print(f"DTYPE {name}[{c}]: spark={s[c].dtype} duckdb={o[c].dtype} ({m})")
            ok = False
    shown = 0
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not cells_equal(a, b):
                if shown < max_diffs:
                    print(f"DIFF  {name}[{c}] row {i}: spark={a!r} duckdb={b!r}")
                shown += 1
                ok = False
    if ok:
        print(f"PASS  {name}: {len(s)} rows exact")
    else:
        print(f"FAIL  {name}: {shown} differing cells")
    return ok


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
        else "/root/testdata/sf0.01"
    )
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    import duckdb

    import __spark_entry__ as e
    from randas_spark.session import get_spark

    spark = get_spark("drivercanon")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = e.queries(), e.oracle_sql()
    names = only or list(qs)
    n_fail = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            try:
                canon_frame(sdf)
                print(f"rows  {name}: {len(sdf)} rows (no oracle; canon-safe)")
            except TypeError as ex:
                print(f"FAIL  {name}: rows-only but driver canon would crash: {ex}")
                n_fail += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        if not compare(name, sdf, odf):
            n_fail += 1
    print(f"\n{len(names) - n_fail} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
