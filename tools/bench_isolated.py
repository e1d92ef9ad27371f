"""Isolated per-query benchmark: one fresh measurement block per query.

bench.py interleaves the whole headline set to defend against box-level
contention; that makes individual numbers comparable run-to-run but means
a query's figure includes cross-query heap/GC interactions. When a single
query's number needs adjudication (e.g. a >1.3x move vs a BASELINE.md
row), run it here: warm once, then median-of-3 back-to-back, nothing else
on the session.

Usage: python tools/bench_isolated.py [sf_dir] query [query ...]
Prints one JSON line: {"queries": {name: sec}, "sf": ..., "protocol": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    rotate = 0
    if "--rotate" in args:
        i = args.index("--rotate")
        if i + 1 >= len(args):
            raise SystemExit("usage: bench_isolated.py [--rotate K] [sf_dir] query ...")
        rotate = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = (
        args.pop(0)
        if args and os.path.isdir(args[0])
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    if not args:
        raise SystemExit("usage: bench_isolated.py [sf_dir] query [query ...]")

    import __spark_entry__ as e
    from randas_spark.session import get_spark

    spark = get_spark("bench-isolated")
    qs = e.queries()
    unknown = [n for n in args if n not in qs]
    if unknown:
        # validate BEFORE running: a typo'd later name would discard
        # minutes of measurements already taken (JSON prints at the end)
        raise SystemExit(f"unknown query name(s): {unknown}")
    if rotate:
        # start-position rotation (BASELINE.md r10 finding: the FIRST
        # query measured in a fresh session absorbs JIT/codegen warmup
        # the single warm run does not fully discharge — q01 measured
        # 0.74-0.93 s first-in-session vs 0.44-0.54 after any other
        # query). Rotating the start per pass spreads the bias so the
        # cross-pass median never sees the same victim twice.
        k = rotate % len(args)
        args = args[k:] + args[:k]
    def drop_persisted() -> None:
        """clearCache() misses localCheckpoint RDDs, which pin executor
        storage for the session — repeated runs of checkpoint-heavy
        queries (the shingle-dedup family) accumulate pinned blocks and
        degrade later samples (diagnosed r8: ppjoin medians inflated
        ~2x by run 3). Unpersist every persistent RDD between samples."""
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    results: dict[str, float] = {}
    for name in args:
        qs[name](spark, sf_dir).collect()  # warm: codegen + file cache
        drop_persisted()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
            drop_persisted()
        results[name] = round(statistics.median(ts), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "queries": results,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "protocol": "isolated median-of-3 after warm",
            }
        )
    )


if __name__ == "__main__":
    main()
