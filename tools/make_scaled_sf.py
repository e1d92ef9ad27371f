"""Deterministically scale the sf0.1 testdata up K× for bench-slope runs.

Usage: python tools/make_scaled_sf.py [K] [src_dir] [out_dir]
Defaults: K=5, src=/root/testdata/sf0.1, out=benchdata/sf0.5.

/root/testdata is read-only and caps at sf0.1, so slope measurements
(does runtime grow linearly with data?) need a bigger input built from
what exists. Each fact table is replicated K times with key offsets that
PRESERVE referential integrity (a copy's lineitems join that same copy's
orders/parts/suppliers); region/nation stay as-is (fixed dimensions,
exactly like TPC-H at every SF).

Two transforms keep the WORKLOAD linear rather than artificially
quadratic:
- documents: every copy's text gets a copy-specific token marker
  (space → " k{i}"), so shingle/minhash near-dup structure within a copy
  is isomorphic to sf0.1 but NO cross-copy near-dup pairs appear —
  otherwise each doc would gain K-1 identical twins and pair counts
  would grow K², poisoning the slope measurement. Copy 0 included, so
  all copies are statistically identical.
- embeddings: per-copy deterministic sign-flip of a dimension subset —
  an orthogonal transform, so within-copy cosines are bit-preserved
  while cross-copy cosines scramble below any dedup threshold.

Keys are offset by table-specific strides far above the original key
ranges so copies never collide.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 10_000_000

# table → columns needing per-copy offsets
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf0.5"
    )
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from randas_spark.session import get_spark

    spark = get_spark("make_scaled_sf")
    # events.parquet has shipped as both TIMESTAMP(NANOS) and
    # timestamp[us] across testdata generations; nanosAsLong makes the
    # nanos generation readable (harmless for native timestamps) and the
    # ts column is written back unchanged — queries.t() branches on the
    # output footer and handles either layout.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    import shutil

    for name in COPY_AS_IS:
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"), os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: copied as-is")

    for name, key_cols in OFFSET_COLS.items():
        base = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        copies = []
        for i in range(k):
            c = base
            for col in key_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * KEY_STRIDE))
            if name == "documents":
                c = c.withColumn(
                    "text", F.regexp_replace(F.col("text"), " ", f" k{i}")
                )
            if name == "embeddings":
                # orthogonal per-copy transform: flip sign of dims where
                # (3*j + i) % 5 == 0 (j = dimension index)
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, j) -> "
                        f"CASE WHEN (3 * j + {i}) % 5 = 0 THEN -x ELSE x END)"
                    ),
                )
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        dest = os.path.join(out, f"{name}._tmp")
        scaled.coalesce(max(4, k)).write.mode("overwrite").parquet(dest)
        # driver tables are single .parquet files, not directories — keep
        # that layout so queries.t() reads them identically
        import glob

        parts = sorted(glob.glob(os.path.join(dest, "part-*.parquet")))
        if len(parts) == 1:
            shutil.move(parts[0], os.path.join(out, f"{name}.parquet"))
            shutil.rmtree(dest)
        else:
            # multi-file: a directory named <table>.parquet works for both
            # Spark and DuckDB parquet readers
            final = os.path.join(out, f"{name}.parquet")
            if os.path.isdir(final) or os.path.exists(final):
                shutil.rmtree(final, ignore_errors=True)
            os.rename(dest, final)
        n = spark.read.parquet(os.path.join(out, f"{name}.parquet")).count()
        print(f"{name}: {n} rows ({k} copies)")


if __name__ == "__main__":
    main()
