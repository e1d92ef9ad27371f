"""Entity resolution: blocked record linkage over dirty string keys.

The canonical ER pipeline shape (Fellegi-Sunter blocking + similarity
scoring) re-expressed Spark-first:

1. compact the record stream to its distinct entity strings FIRST (the
   entity table is orders of magnitude smaller than the records at
   corpus scale — 64 names for 2,000 parts here, millions of names for
   billions of rows at 100 TB);
2. BLOCK on shared name tokens — candidate pairs only form inside a
   token block, never all-pairs. Hot blocks (stopword-like tokens)
   are dropped by an explicit cap with the standard documented recall
   trade: a pair whose ONLY shared token is a stopword is not a
   linkage signal;
3. score candidates with character-bigram Jaccard computed INLINE by
   codegen array expressions (no UDF, no second join): bigram sets are
   derived from the two name columns directly on the pair row.

Every stage is a plain groupBy/equi-join, so the plan survives a
1000-executor scale-up: the only data-sized operation is the initial
distinct; blocking and scoring run on the compacted entity table.

No equivalent exists in the reference (dataframe.rs has no string
similarity); the design follows the public blocking-ER literature
(Fellegi-Sunter 1969; Papadakis et al. blocking surveys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bigrams(col: Column) -> Column:
    """Distinct character bigrams of a string as an array<string>.

    ``sequence(1, greatest(length-1, 1))`` guards the single-char case
    (Spark's sequence DESCENDS when stop < start, which would yield a
    bogus [1,0] index list); a 1-char name contributes itself as its
    only "bigram" on both engines.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(2))))


def sql_bigrams(expr: str) -> str:
    """DuckDB twin of :func:`_bigrams` (same guard, same distinct)."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(length({expr}) - 1, 1)), "
        f"i -> substr({expr}, i, 2)))"
    )


def blocked_name_matches(
    records: DataFrame,
    name_col: str,
    threshold: float = 0.45,
    block_cap: int = 1000,
    digits: int = 4,
) -> DataFrame:
    """Match near-duplicate entity names by token blocking + bigram
    Jaccard. Returns ``(name_a, n_a, name_b, n_b, sim)`` for every
    distinct candidate pair with ``sim >= threshold``, where ``n_*`` are
    raw record frequencies (the linkage report a dedup/merge step
    consumes).

    Intersection size uses ``filter(a, x -> array_contains(b, x))`` over
    already-distinct arrays — identical, engine-portable semantics — and
    union size is |A| + |B| - |I|, so the score is deterministic.
    """
    from randas_spark.queries import fround

    ents = records.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rec")
    )
    toks = ents.select(
        "name", "n_rec", F.explode(F.split(F.col("name"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    # Hot-block cap: token blocks above the cap are dropped entirely
    # (documented recall trade; a shared ultra-common token is not a
    # linkage signal). Sized so every survivor's pair fan-out is bounded.
    ok = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("block_n"))
        .filter(F.col("block_n") <= block_cap)
        .select("tok")
    )
    blocked = toks.join(ok, "tok")
    a = blocked.select(
        "tok", F.col("name").alias("name_a"), F.col("n_rec").alias("n_a")
    )
    b = blocked.select(
        "tok", F.col("name").alias("name_b"), F.col("n_rec").alias("n_b")
    )
    pairs = (
        a.join(b, "tok")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "n_a", "name_b", "n_b")
        .distinct()  # a pair sharing k tokens must score once, not k times
    )
    ba = _bigrams(F.col("name_a"))
    bb = _bigrams(F.col("name_b"))
    inter = F.size(F.filter(ba, lambda x: F.array_contains(bb, x)))
    union = F.size(ba) + F.size(bb) - inter
    sim = inter.cast("double") / union.cast("double")
    return (
        pairs.withColumn("sim", fround(sim, digits))
        .filter(F.col("sim") >= threshold)
        .select("name_a", "n_a", "name_b", "n_b", "sim")
    )


def sql_blocked_name_matches(
    table_expr: str,
    name_col: str,
    threshold: float = 0.45,
    block_cap: int = 1000,
    digits: int = 4,
) -> str:
    """DuckDB twin of :func:`blocked_name_matches`."""
    from randas_spark.queries import sql_fround

    ba = sql_bigrams("name_a")
    bb = sql_bigrams("name_b")
    return f"""
    WITH ents AS (
        SELECT {name_col} AS name, CAST(count(*) AS BIGINT) AS n_rec
        FROM {table_expr} GROUP BY 1
    ),
    toks AS (
        SELECT name, n_rec, unnest(string_split(name, ' ')) AS tok FROM ents
    ),
    toks_ne AS (SELECT * FROM toks WHERE tok <> ''),
    ok AS (
        SELECT tok FROM toks_ne GROUP BY tok HAVING count(*) <= {block_cap}
    ),
    blocked AS (SELECT t.* FROM toks_ne t JOIN ok USING (tok)),
    pairs AS (
        SELECT DISTINCT a.name AS name_a, a.n_rec AS n_a,
                        b.name AS name_b, b.n_rec AS n_b
        FROM blocked a JOIN blocked b USING (tok)
        WHERE a.name < b.name
    ),
    scored AS (
        SELECT name_a, n_a, name_b, n_b,
               {sql_fround(
                   f"CAST(len(list_filter({ba}, x -> list_contains({bb}, x))) AS DOUBLE)"
                   f" / CAST(len({ba}) + len({bb})"
                   f" - len(list_filter({ba}, x -> list_contains({bb}, x))) AS DOUBLE)",
                   digits,
               )} AS sim
        FROM pairs
    )
    SELECT name_a, n_a, name_b, n_b, sim FROM scored WHERE sim >= {threshold}
    """
