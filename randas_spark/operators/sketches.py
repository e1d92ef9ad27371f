"""Mergeable frequency sketches — Count-Min, engine-portable.

Companion to the HLL distinct-count sketches (queries/relational.py
rel_hll_sketch_mergeable): where HLL answers "how many distinct", a
Count-Min sketch answers "how often does key k occur" in O(depth×width)
space with a one-sided error (never undercounts; overcounts by at most
ε·N with probability 1−δ, ε = e/width, δ = e^−depth — Cormode &
Muthukrishnan 2005).

Unlike Spark's HLL (whose estimate is engine-specific), this CMS derives
its bucket indices from md5 — ``bucket_d(key) = value of the first two
hex digits of md5(d || '|' || key)`` — so the ENTIRE sketch (cells,
merge, estimates) is bit-identical on any engine with md5() and
instr(): Spark, DuckDB, Python. The sketch of a 100 TB shard can be
rebuilt and audited by a different engine, and shard sketches merge by
cell-wise addition (count agg is associative/commutative) — the
property that lets per-day / per-shard sketches roll up without
rescanning the facts.

Scale: the build is one groupBy over (depth × width) ≤ a few thousand
cells — map-side partial agg reduces every partition to sketch size
before the shuffle, so the shuffle volume is O(cells), not O(rows).
Estimation joins the (small) key list against the (tiny) cell table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _bucket_sql(key_expr: str, d: int, spark_dialect: bool) -> str:
    """Bucket index in [0, 256): value of the first two hex digits of
    md5(d || '|' || key). Spark's md5 needs a binary cast, DuckDB's a
    varchar — everything else is the same text, so the two dialects
    cannot drift."""
    if spark_dialect:
        h = f"md5(cast(concat('{d}', '|', cast({key_expr} as string)) as binary))"
    else:
        h = f"md5('{d}' || '|' || CAST({key_expr} AS VARCHAR))"
    d1 = f"(instr('{_HEX}', substr({h}, 1, 1)) - 1)"
    d2 = f"(instr('{_HEX}', substr({h}, 2, 1)) - 1)"
    return f"({d1} * 16 + {d2})"


def countmin_cells(
    df: DataFrame, key_col: str, shard_col: str | None, depth: int = 4
) -> DataFrame:
    """Per-shard CMS cells: (shard, d, bucket, cnt). Shard sketches are
    the mergeable unit — cell-wise SUM merges any subset of shards.
    ``shard_col=None`` builds one unsharded sketch (d, bucket, cnt) —
    the shape the join-cardinality estimator consumes per side."""
    from randas_spark.operators.dedup import fan_out

    # depth md5 calls per input row: fan a single-split input out to core
    # count before the hash stage (no-op on many-split cluster inputs).
    # NULL keys are dropped up front (count-distinct discipline): a null
    # key hashes to a NULL bucket, which would sit in the cells yet
    # never match a probe — counted but unqueryable.
    df = fan_out(df.filter(F.col(key_col).isNotNull()))
    shard = [F.col(shard_col).alias("shard")] if shard_col else []
    rows = df.select(
        *shard,
        *[F.expr(_bucket_sql(key_col, d, True)).alias(f"b{d}") for d in range(depth)],
    )
    return (
        rows.select(
            *(["shard"] if shard_col else []),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(d).alias("d"), F.col(f"b{d}").alias("bucket"))
                        for d in range(depth)
                    ]
                )
            ).alias("x"),
        )
        .groupBy(
            *(["shard"] if shard_col else []),
            F.col("x.d").alias("d"),
            F.col("x.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(df: DataFrame, key_col: str, shard_col: str, depth: int = 4) -> DataFrame:
    """(key, exact_cnt, est_cnt, no_undercount): build per-shard
    sketches, merge them cell-wise, estimate every key as
    min_d cell[d][bucket_d(key)], and carry the exact count + the CMS
    one-sided-error verdict alongside. Deterministic cross-engine."""
    df = df.filter(F.col(key_col).isNotNull())  # match countmin_cells
    cells = countmin_cells(df, key_col, shard_col, depth)
    merged = cells.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    keys = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = keys.select(
        "key",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(_bucket_sql("key", d, True)).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("x"),
    ).select("key", "exact_cnt", "x.d", "x.bucket")
    est = (
        probes.join(F.broadcast(merged), ["d", "bucket"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return est.select(
        "key",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") >= F.col("exact_cnt")).alias("no_undercount"),
    )


def sql_countmin_estimate(
    table: str, key_col: str, shard_col: str, depth: int = 4
) -> str:
    """DuckDB twin of :func:`countmin_estimate` — generated from the
    same bucket formula so the engines cannot drift."""
    bucket_rows = "\n            UNION ALL ".join(
        f"SELECT {shard_col} AS shard, {d} AS d, {_bucket_sql(key_col, d, False)} AS bucket FROM {table}"
        for d in range(depth)
    )
    probe_rows = "\n            UNION ALL ".join(
        f"SELECT key, exact_cnt, {d} AS d, {_bucket_sql('key', d, False)} AS bucket FROM keys"
        for d in range(depth)
    )
    return f"""
    WITH cells AS (
        SELECT shard, d, bucket, count(*) AS cnt FROM (
            {bucket_rows}
        ) GROUP BY shard, d, bucket
    ),
    merged AS (SELECT d, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
               FROM cells GROUP BY d, bucket),
    keys AS (
        SELECT {key_col} AS key, count(*) AS exact_cnt FROM {table} GROUP BY {key_col}
    ),
    probes AS (
        {probe_rows}
    )
    SELECT key, exact_cnt, min(cnt) AS est_cnt,
           min(cnt) >= exact_cnt AS no_undercount
    FROM probes JOIN merged USING (d, bucket)
    GROUP BY key, exact_cnt
    """


def bloom_bits(df: DataFrame, key_col: str, n_bits: int = 4096, n_hashes: int = 3) -> DataFrame:
    """One-row Bloom filter of a key set: (bit_positions array<long>).

    Bit positions derive from md5 hex digits (three 3-digit slices →
    positions mod n_bits when n_bits = 16^3 = 4096), so membership is
    engine-portable like the Count-Min buckets. Build is a groupBy-free
    aggregate: explode each key to its n_hashes positions, collect the
    DISTINCT positions — at most n_bits longs however many keys went in
    (the mergeable, broadcastable summary a semi-join reduction ships).
    
    Build and probe MUST use the same (n_bits, n_hashes): probing with
    more hashes than the build set requires positions that were never
    written, turning the 'no false negatives' guarantee into mass false
    negatives with no error. Validated here and in bloom_prefilter.
    """
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    if n_bits != 4096 or n_hashes > 10:
        raise ValueError("this portable build is fixed at n_bits=4096 (16^3), n_hashes<=10")
    pos_cols = [
        F.expr(_bloom_pos_sql(key_col, h, True)).alias(f"p{h}") for h in range(n_hashes)
    ]
    return (
        df.select(*pos_cols)
        .select(F.explode(F.array(*[F.col(f"p{h}") for h in range(n_hashes)])).alias("pos"))
        .agg(F.array_sort(F.collect_set("pos")).alias("bits"))
    )


def _bloom_pos_sql(key_expr: str, h: int, spark_dialect: bool) -> str:
    """Bit position for hash h in [0, 4096): the FIRST three hex digits
    of md5('b{h}' || '|' || key) — each hash salts the md5 INPUT with its
    index and reads digits 1..3, the same instr-digit primitive as the
    CMS buckets."""
    if spark_dialect:
        hx = f"md5(cast(concat('b{h}', '|', cast({key_expr} as string)) as binary))"
    else:
        hx = f"md5('b{h}' || '|' || CAST({key_expr} AS VARCHAR))"
    digits = [
        f"(instr('{_HEX}', substr({hx}, {i + 1}, 1)) - 1)" for i in range(3)
    ]
    return f"({digits[0]} * 256 + {digits[1]} * 16 + {digits[2]})"


def bloom_prefilter(fact: DataFrame, key_col: str, bloom: DataFrame, n_hashes: int = 3) -> DataFrame:
    """Keep fact rows whose key MIGHT be in the bloomed set (all
    n_hashes positions present): the semi-join reduction that prunes a
    100 TB probe side BEFORE the join shuffle, shipping a <=4096-long
    array instead of the key set. False positives pass (the join
    re-checks); false negatives are impossible — the property the
    oracle proves cross-engine."""
    from randas_spark.operators.dedup import fan_out

    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    b = F.broadcast(bloom)
    # n_hashes md5 calls per fact row — parallelize a single-split scan
    crossed = fan_out(fact).crossJoin(b)
    cond = None
    for h in range(n_hashes):
        c = F.array_contains(F.col("bits"), F.expr(_bloom_pos_sql(key_col, h, True)))
        cond = c if cond is None else (cond & c)
    return crossed.filter(cond).drop("bits")


# --------------------------------------------------------------------------
# Mergeable quantile sketch (binary-mantissa histogram)
# --------------------------------------------------------------------------
#
# Companion to CMS (frequencies) and HLL (distinct counts): a mergeable
# APPROXIMATE-QUANTILE sketch. Values (in integer cents) are binned by
# their binary magnitude plus 4 mantissa bits:
#
#   msb     = length(bin(cents))            -- highest set bit, 1-based
#   k       = max(msb - 5, 0)               -- dropped low bits
#   shifted = floor(cents / 2^k)            -- leading 5 bits (16..31), or
#                                              the exact value when < 32
#   bin_key = msb * 32 + shifted            -- order-preserving, unique
#
# Relative bin width is <= 1/16, so any quantile read off the bin
# midpoints has <= ~3.2% relative error — t-digest accuracy class with
# NONE of its engine-specific centroid state. Every step is integer
# arithmetic plus exact powers of two, so the sketch is bit-identical
# on Spark, DuckDB, or Python: a 100 TB shard's sketch can be rebuilt
# and audited by a different engine.
#
# Mergeability is trivial by construction — a sketch is a (bin_key ->
# count) map and merge is cell-wise addition — which is what lets
# per-shard / per-day sketches roll up into corpus quantiles without
# rescanning facts. The build is one partial-agg groupBy: the shuffle
# carries O(bins) cells per partition, not rows.


def quantile_sketch_bins(df: DataFrame, value_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """(group..., bin_key, k, shifted, cnt) histogram sketch of
    floor(value*100) cents; non-positive values are excluded (the money
    domain). One map-side-combinable groupBy."""
    from randas_spark.operators.dedup import fan_out

    cents = F.floor(F.col(value_col) * 100).cast("long")
    # bin()/length do per-row string work — fan a single-split local
    # input out to core count (no-op on streams and many-split cluster
    # scans), AFTER the projection so the exchange carries only
    # (group_cols, cents), never the full fact row
    base = fan_out(
        df.select(*(group_cols or []), cents.alias("cents")).filter(F.col("cents") >= 1)
    )
    msb = F.length(F.bin(F.col("cents")))
    k = F.greatest(msb - F.lit(5), F.lit(0))
    divisor = F.pow(F.lit(2.0), k)
    shifted = F.floor(F.col("cents") / divisor).cast("long")
    binned = base.select(
        *(group_cols or []),
        (msb * 32 + shifted).cast("long").alias("bin_key"),
        k.cast("long").alias("k"),
        shifted.alias("shifted"),
    )
    return binned.groupBy(*(group_cols or []), "bin_key", "k", "shifted").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def quantile_sketch_merge(bins: DataFrame) -> DataFrame:
    """Merge sketches (drop group columns, sum cells) — cell-wise
    addition is the whole merge law."""
    return bins.groupBy("bin_key", "k", "shifted").agg(F.sum("cnt").alias("cnt"))


def quantile_sketch_estimate(bins: DataFrame, quantiles: dict[str, float]) -> DataFrame:
    """(q_label, n_total, est): for each q, the midpoint of the first
    bin whose cumulative count reaches ceil(q*n). The cumulative walk
    runs over the (tiny) bin table, never the facts."""
    from pyspark.sql import Window

    spark = bins.sparkSession
    w = Window.orderBy("bin_key").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = bins.select(
        "bin_key",
        ((F.col("shifted") + F.lit(0.5)) * F.pow(F.lit(2.0), F.col("k")) / F.lit(100.0)).alias("mid"),
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n_total"),
    )
    qs = spark.createDataFrame(
        sorted(quantiles.items()), "q_label string, q double"
    )
    hit = qs.crossJoin(cum).filter(
        # -1e-9 before ceil: fl(q*n) can land 1 ulp ABOVE the exact
        # product (e.g. 0.07*100 = 7.000000000000001), bumping the target
        # rank by one and shifting the answer a whole bin
        F.col("cum") >= F.ceil(F.col("q") * F.col("n_total") - F.lit(1e-9))
    )
    from randas_spark.queries import fround

    return hit.groupBy("q_label").agg(
        F.max("n_total").alias("n_total"),
        fround(F.min_by("mid", "bin_key"), 6).alias("est"),
    )


# --------------------------------------------------------------------------
# Portable HyperLogLog (md5 registers — bit-identical cross-engine)
# --------------------------------------------------------------------------
#
# Spark's approx_count_distinct is an engine-private HLL: its estimate
# can only be oracle-checked with a tolerance verdict
# (rel_approx_count_distinct). This HLL derives everything from md5 —
# bucket = first 2 hex digits (m=256 registers), rho = leading-zero
# rank of the next 8 hex digits as a 32-bit word — so registers AND
# estimates are bit-identical on Spark, DuckDB, and Python:
#
# - the harmonic sum Σ 2^-M_j adds exact powers of two spanning ≤ 41
#   bits (2^-33..2^0 over 256 terms), so every partial sum is exact and
#   the float result is ORDER-INDEPENDENT — no rounding slack needed
#   for the sum itself (ln() in the small-range correction is the one
#   libm call; fround absorbs it);
# - merge = per-bucket MAX of registers (shards/days roll up without
#   fact rescans), the HLL merge law;
# - standard error ~ 1.04/sqrt(256) ≈ 6.5%.


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """(group..., bucket, rho) register table; rho = max over keys of
    (number of leading zeros in the 32-bit hash word) + 1. One
    map-side-combinable groupBy — shuffle volume O(groups × 256)."""
    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    bucket = (F.conv(F.substring(h, 1, 2), 16, 10)).cast("long")
    word = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    # bit_length via bin(): rho = 32 - bit_length(word) + 1; word==0 -> 33
    rho = F.when(F.col("__w__") == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(F.col("__w__")))
    )
    # no fan_out here, by measurement: one md5 per row over a narrow
    # column is cheaper than the repartition round-trip at sf0.1
    # (1.10 s fanned vs 0.99 serial), unlike the quantile sketch's
    # heavier per-row stage — and many-split cluster scans parallelize
    # natively anyway (0.65 s at sf1.0 with 10 splits)
    # countDistinct semantics: NULL keys are ignored (md5(NULL) would
    # emit a phantom NULL-bucket register that hll_estimate counts in
    # the occupied-bucket total but not in the harmonic sum)
    base = df.filter(F.col(key_col).isNotNull()).select(
        *(group_cols or []), bucket.alias("bucket"), word.alias("__w__")
    )
    return (
        base.withColumn("rho", rho.cast("long"))
        .groupBy(*(group_cols or []), "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame) -> DataFrame:
    """Merge register shards: per-bucket MAX (group columns dropped)."""
    return registers.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, group_cols: list[str] | None = None, m: int = 256) -> DataFrame:
    """(group..., est): the HLL estimate with BOTH standard corrections —
    small-range (linear counting when raw ≤ 2.5m and empty buckets exist)
    and large-range (est = -2^32·ln(1 - raw/2^32) when raw > 2^32/30,
    compensating 32-bit hash-word collisions above ~143M distinct keys;
    without it the estimate biases low at 100 TB-audit cardinalities).
    Runs over the tiny register table; oracle mirrors both branches."""
    alpha = 0.7213 / (1 + 1.079 / m)
    two32 = 4294967296.0
    agg = registers.groupBy(*(group_cols or [])).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s__"),
        F.count(F.lit(1)).alias("__present__"),
    )
    zeros = F.lit(m) - F.col("__present__")
    harm = F.col("__s__") + zeros.cast("double")  # absent buckets add 2^0
    raw = F.lit(alpha * m * m) / harm
    est = (
        F.when(
            (raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        )
        .when(
            raw > F.lit(two32 / 30.0),
            F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )
    return agg.select(*(group_cols or []), est.alias("est"))
