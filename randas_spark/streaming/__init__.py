"""Structured Streaming layer (SURVEY.md §7 M5).

The reference has no streaming at all (SURVEY.md §2.12); this package
provides the standard stream-processing surface over the events-table
shape: windowed aggregations (tumbling / sliding / session), watermarked
late-data handling, streaming dedup, and custom stateful operators.

Design: every transformation is a *builder taking a DataFrame* — batch or
streaming — so the exact same code path serves `spark.read` and
`spark.readStream`. Batch-replay equivalence (the oracle check) is then a
property of the builder, not a re-implementation.
"""
