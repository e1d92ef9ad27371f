"""User-defined function surface beyond the reference's single closure
predicate (SURVEY.md §2.11 — apply_condition, dataframe.rs:532): the
full Spark matrix, each in its Arrow-vectorized form.

- scalar pandas_udf      — element-wise, Arrow-batched (10-100x over
  row-at-a-time Python UDFs; still the slow path vs built-ins)
- grouped-agg pandas_udf — custom aggregate over a group/window
- Python UDTF            — one input → many output rows, table-valued

Use these shapes only when built-in expressions genuinely can't express
the semantics; everything in randas_spark's hot paths stays JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg pandas UDF: sum(v*w)/sum(w) per group — the UDAF shape
    (built-ins can do this one; it exists as the canonical example of the
    form, oracle-checked in llm/relational tests)."""
    # mask weights of null values: pandas' sum skips the NaN PRODUCTS
    # but would still count those rows' weights in the denominator,
    # biasing the mean toward zero (v=[1, null], w=[1, 1] must give 1.0,
    # not 0.5); all-null groups yield NaN, not 0.0
    mask = values.notna()
    denom = weights[mask].sum()
    return float((values[mask] * weights[mask]).sum() / denom) if denom else float("nan")


@pandas_udf("string")
def nfc_normalize(s: pd.Series) -> pd.Series:  # type: ignore[misc]
    """Unicode NFC normalization, Arrow-batched (pandas ``str.normalize``
    → Python ``unicodedata`` under the hood). The ONE text-pipeline stage
    the JVM built-ins cannot express — composed code points (e + U+0301
    vs precomposed é) must canonicalize before hashing/dedup or visually
    identical docs fingerprint differently. DuckDB twin:
    ``nfc_normalize(...)`` (oracle-verified bit-identical). Nulls pass
    through as nulls."""
    return s.str.normalize("NFC")


@udtf(returnType="word string, pos int")
class SplitWords:
    """Python UDTF: text → one row per word with its position. The
    table-valued shape (explode is the built-in twin; a real use is
    producing multiple typed columns per emitted row from one input)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, w in enumerate(text.split()):
            yield (w, i)
