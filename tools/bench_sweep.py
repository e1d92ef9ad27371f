"""Full-registry timing sweep — every queries() entry, one timed pass.

The headline bench (bench.py) covers the headline set; this
sweeps ALL of them so a newly-added operator can't hide a serial scan or
quadratic stage outside the headline set (the round-4 sweep found a
201-second Levenshtein landmine exactly this way). Single pass per query
(cold-ish: caches cleared between queries) — the output is a triage
ranking, not a protocol number; adjudicate suspects with
tools/bench_isolated.py.

CONTENTION-PROOFING (r14, VERDICT r13 order #2): the r13 sweeps were
twice contaminated by multi-minute HOST-side load windows (external to
this sandbox: llm_pca_project2 read 171 s in-sweep vs 2.18 s isolated)
and had to be re-adjudicated by hand. The sweep now interleaves the
bench.py calib probe (fixed-size JVM workload — its wall moves only
with box contention) every ``CHUNK`` queries and re-runs any chunk
whose bracketing witnesses exceeded 2x the session's calib floor,
keeping the lower time per query. Each query's output row carries its
bracketing calib witnesses so a reader can audit residual inflation.
Also fixed from r8's bench.py lesson: clearCache() misses
localCheckpoint RDDs, so checkpoint-heavy queries accumulated pinned
blocks across the sweep — every persistent RDD is now unpersisted
between queries, same as bench.py's drop_persisted().

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

CHUNK = 5  # queries per calib bracket (~0.3 s probe per 5 queries)
CALIB_GATE = 2.0  # bracketing witness > gate x calib floor => re-run chunk


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

    def drop_persisted() -> None:
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
        return round(time.perf_counter() - t0, 4)

    def run_one(name: str):
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
        except Exception as ex:  # noqa: BLE001
            return None, str(ex).splitlines()[0][:200]
        finally:
            drop_persisted()
        return round(dt, 3), None

    times: dict[str, float] = {}
    witnesses: dict[str, list[float]] = {}
    failures: dict[str, str] = {}
    retried_chunks: list[dict] = []

    # seed the calib floor with 3 opening probes (also JIT-warms the probe)
    calibs = [calib() for _ in range(3)]
    calib_floor = min(calibs)

    names = list(qs)
    chunks = [names[i : i + CHUNK] for i in range(0, len(names), CHUNK)]
    c_before = calib()
    calib_floor = min(calib_floor, c_before)
    for chunk in chunks:
        for name in chunk:
            dt, err = run_one(name)
            if err is not None:
                failures[name] = err
            else:
                times[name] = dt
        c_after = calib()
        calib_floor = min(calib_floor, c_after)
        contaminated = (
            c_before > CALIB_GATE * calib_floor or c_after > CALIB_GATE * calib_floor
        )
        if contaminated:
            # the span overlapped a host-contention window: one bounded
            # re-run per query in the chunk, keep the lower time
            r_before = calib()
            calib_floor = min(calib_floor, r_before)
            for name in chunk:
                if name in failures:
                    continue
                dt, err = run_one(name)
                if err is None and dt < times[name]:
                    times[name] = dt
            r_after = calib()
            calib_floor = min(calib_floor, r_after)
            retried_chunks.append(
                {
                    "queries": chunk,
                    "dirty_calibs": [c_before, c_after],
                    "rerun_calibs": [r_before, r_after],
                }
            )
            for name in chunk:
                witnesses[name] = [r_before, r_after]
            c_after = r_after
        else:
            for name in chunk:
                witnesses[name] = [c_before, c_after]
        for name in chunk:
            if name in times:
                print(
                    f"{times[name]:9.3f}s  {name}  calib={witnesses[name]}",
                    file=sys.stderr,
                )
        c_before = c_after

    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    print(
        json.dumps(
            {
                "metric": "full_registry_sweep",
                "sf_dir": sf_dir,
                "n": len(times),
                "total_sec": round(sum(times.values()), 2),
                "calib_floor": calib_floor,
                "n_retried_chunks": len(retried_chunks),
                "retried_chunks": retried_chunks,
                "over_threshold": {k: v for k, v in ranked.items() if v >= threshold},
                "slowest": dict(list(ranked.items())[:15]),
                "failures": failures,
                "witnesses": {k: witnesses.get(k) for k in ranked},
            }
        )
    )


if __name__ == "__main__":
    main()


