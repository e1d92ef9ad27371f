"""Skew mitigation for joins and aggregations: key salting.

AQE's skew-join split (on in session.get_spark) handles most runtime skew
by splitting oversized shuffle partitions, but it only helps sort-merge
joins of two shuffled sides. Salting is the explicit, plan-level fix that
also works for aggregations and for cases AQE can't split (a single
pathological key inside one partition):

- **salted_join**: explode the small side K ways (one copy per salt),
  append a random salt 0..K-1 to the big side's key, join on
  (key, salt). The hot key's rows spread over K partitions; output is
  row-identical to the plain join. Cost: small side replicated K times —
  keep K modest (8-64) and the small side genuinely small.
- **salted_agg**: two-phase aggregate — partial aggregate on
  (key, salt), then final aggregate on key. Identical to what map-side
  partial aggregation already does for algebraic functions; explicit
  salting matters for high-cardinality-input aggregates (collect_list,
  exact distinct) where one key's group state exceeds a partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a small side, spreading each key
    over ``num_salts`` shuffle partitions.

    Row-identical to ``big.join(small, on, how)`` for how in
    inner/left — each big row carries exactly one salt and meets exactly
    the one replicated small row with that salt.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        _SALT, (F.rand(seed=7) * num_salts).cast("int")
    )
    small_salted = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_salted.join(small_salted, [*keys, _SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggregates.

    ``aggs`` maps output name → first-phase aggregate expression; the
    second phase re-combines with the matching combiner (sum→sum,
    count→sum, min→min, max→max — pass the *first-phase* expr; the
    combine step is inferred from the expression's function name).
    """
    first = [expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    partial = (
        df.withColumn(_SALT, (F.rand(seed=7) * num_salts).cast("int"))
        .groupBy(*keys, _SALT)
        .agg(*first)
    )
    combines = []
    for name, expr in aggs.items():
        # Column repr is "Column<'sum(v)'>" — the leading function name
        # identifies the combiner. (Spark 4 no longer exposes the
        # expression tree through py4j.)
        rep = str(expr)
        if "DISTINCT" in rep.upper():
            # countDistinct/sum_distinct parse to fn 'count'/'sum', and
            # summing PER-SALT distincts double-counts any value split
            # across salts — a silent overcount, so reject loudly
            raise ValueError(
                f"DISTINCT aggregate for {name!r} cannot be salt-combined "
                "(per-salt distincts overlap); use approx_count_distinct or "
                "a two-stage exact distinct"
            )
        fn = rep.split("'", 1)[1].split("(")[0].strip().lower()
        combiner = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}.get(fn)
        if combiner is None:
            raise ValueError(
                f"aggregate {fn!r} is not algebraic-combinable; use a "
                f"sketch (approx_*) or plain groupBy for {name}"
            )
        combines.append(combiner(f"__p_{name}").alias(name))
    return partial.groupBy(*keys).agg(*combines)
