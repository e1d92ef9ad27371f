"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, floats rendered via repr of round(9)).

Usage: python tools/selfcheck.py [--json OUT.json] [sf_dir] [query ...]

With ``--json`` the run also writes a machine-readable artifact (VERDICT
r8 order #4): one record per query — ``{rows_match, schema_match,
hash_match, err, n_rows, secs}`` — plus a summary block, so the
full-registry correctness claim is a diffable committed file instead of
a commit-message number. The stdout report is unchanged.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from randas_spark.session import TABLES  # single source of truth


def canon(value) -> str:
    import datetime

    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if math.isinf(value):
            # int(inf) raises OverflowError — would abort the whole run
            return "Infinity" if value > 0 else "-Infinity"
        # ROUND FIRST: 2.0000000000001 vs 2.0 must canonize identically
        # (checking the int fast-path on the raw value sent one to '2.0'
        # and the other to '2' — a spurious hash mismatch at integer
        # boundaries inside the intended tolerance)
        value = round(value, 9)
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return repr(value)
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    return str(value)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: selfcheck.py [sf_dir] [names...] [--json OUT.json]",
                  file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    only = set(a for a in argv if not os.path.isdir(a))

    import duckdb

    import __spark_entry__ as e
    from randas_spark.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    records: dict[str, dict] = {}

    def record(name, *, rows=None, schema=None, vhash=None, err=None, n_rows=None, secs=None):
        records[name] = {
            "rows_match": rows,
            "schema_match": schema,
            "hash_match": vhash,
            "err": err,
            "n_rows": n_rows,
            "secs": round(secs, 2) if secs is not None else None,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            record(name, err=f"spark error: {ex}"[:300], secs=time.time() - t0)
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{dt:.1f}s]")
            record(name, n_rows=len(srows), secs=dt)
            n_rowsonly += 1
            continue
        try:
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            record(name, err=f"duckdb error: {ex}"[:300], n_rows=len(srows), secs=dt)
            n_fail += 1
            continue
        problems = []
        rows_ok = len(srows) == len(drows)
        if not rows_ok:
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        schema_ok = sorted(scols) == sorted(dcols)
        hash_ok = None
        if not schema_ok:
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            hash_ok = hs == hd
            if not hash_ok:
                problems.append(f"valuehash spark={hs} duckdb={hd}")
        record(
            name,
            rows=rows_ok,
            schema=schema_ok,
            vhash=hash_ok,
            n_rows=len(srows),
            secs=dt,
        )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{dt:.1f}s]")
            if "valuehash" in "".join(problems) and len(srows) == len(drows):
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(canon(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = sorted("|".join(canon(r[i]) for i in dorder) for r in drows)
                for a, b in zip(sset, dset):
                    if a != b:
                        print(f"      first diff:\n      spark : {a[:200]}\n      duckdb: {b[:200]}")
                        break
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rowsonly,
                    "n_registry": len(qs),
                    "protocol": "tools/selfcheck.py full-oracle canon (round-9 format)",
                    "queries": records,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
        print(f"wrote {json_out} ({len(records)} records)")
    if only:
        unknown = only - set(qs)
        if unknown:
            # a typo'd name (or a nonexistent sf_dir reclassified as a
            # filter) must FAIL the gate, not run zero queries and exit 0
            print(f"UNKNOWN query name(s): {sorted(unknown)}")
            return 1
    if n_pass + n_fail == 0:
        print("no queries ran — failing the gate")
        return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
