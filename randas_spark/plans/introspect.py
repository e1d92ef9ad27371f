"""Physical-plan introspection helpers.

The engine's 100 TB posture is enforced at the PLAN level: filters
reach the parquet scan, dimensions broadcast, bucketed joins drop their
exchanges. These helpers parse the executed plan so tests (and users
tuning a query) can assert those properties instead of eyeballing
`.explain` output.

There is no Catalyst rule authoring here on purpose — SURVEY.md §4
concluded zero custom optimizer work is needed; the engine's job is to
*verify* that the declarative plans it emits keep their scale
properties.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcast exchanges,
    which move only the small side, and reused exchanges, which add no
    second shuffle)."""
    return len(
        re.findall(
            r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)",
            executed_plan(df),
        )
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """One raw `PushedFilters: [...]` payload string per file scan, in
    plan order (predicates contain commas and brackets of their own, so
    callers substring-match rather than getting a tokenized list; note the
    plan printer truncates very long filter lists with '...')."""
    out: list[str] = []
    for line in executed_plan(df).splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]?\s*$", line)
        if m:
            out.append(m.group(1).rstrip("]"))
    return out
