"""Full-registry timing sweep — every queries() entry, one timed pass.

The headline bench (bench.py) covers the headline set; this
sweeps ALL of them so a newly-added operator can't hide a serial scan or
quadratic stage outside the headline set (the round-4 sweep found a
201-second Levenshtein landmine exactly this way). Single pass per query
(cold-ish: caches cleared between queries) — the output is a triage
ranking, not a protocol number; adjudicate suspects with
tools/bench_isolated.py.

Usage: python tools/bench_sweep.py [sf_dir] [threshold_sec]
Prints one JSON line {total_sec, n, over_threshold: {...}, slowest: {...}}
and a per-query table on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = (
        args.pop(0)
        if args and os.path.isdir(args[0])
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    threshold = float(args[0]) if args else 5.0

    import __spark_entry__ as e
    from randas_spark.session import get_spark

    spark = get_spark("bench-sweep")
    qs = e.queries()
    times: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            # stop the clock BEFORE clearCache (finally runs before the
            # next statement, so measuring afterward would charge each
            # query its own unpersist cost and skew the triage ranking)
            dt = time.perf_counter() - t0
        except Exception as ex:  # noqa: BLE001
            failures[name] = str(ex).splitlines()[0][:200]
            continue
        finally:
            spark.catalog.clearCache()
        times[name] = round(dt, 3)
        print(f"{times[name]:9.3f}s  {name}", file=sys.stderr)

    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    print(
        json.dumps(
            {
                "metric": "full_registry_sweep",
                "sf_dir": sf_dir,
                "n": len(times),
                "total_sec": round(sum(times.values()), 2),
                "over_threshold": {k: v for k, v in ranked.items() if v >= threshold},
                "slowest": dict(list(ranked.items())[:15]),
                "failures": failures,
            }
        )
    )


if __name__ == "__main__":
    main()
