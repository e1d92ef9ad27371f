"""Batch-stream equivalence for the M5 streaming layer (SURVEY.md §7.2).

The builders in randas_spark.streaming.engine are plan constructors that
work identically on batch and streaming DataFrames. The oracle harness
checks the batch side against DuckDB (queries/streaming_q.py); here we
replay the SAME builder over readStream into a memory sink and assert the
streaming result equals the batch result — closing the loop:
DuckDB oracle == batch plan == streaming plan.
"""

from __future__ import annotations

import os
import shutil

import pytest

from tests.conftest import SF_DIR


def _collect_sorted(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def batch_events(spark):
    from randas_spark.queries import t

    return t(spark, SF_DIR, "events").cache()


def _run_stream(spark, builder, name, output_mode="complete", copies=1, files_per_trigger=10):
    """Stage the events file (optionally duplicated), run builder over
    readStream to completion, return the memory-sink table."""
    from randas_spark.streaming.engine import events_stream, run_to_memory

    stream, stage = events_stream(spark, SF_DIR, files_per_trigger=files_per_trigger)
    try:
        for i in range(1, copies):
            shutil.copy(
                os.path.join(SF_DIR, "events.parquet"),
                os.path.join(stage, f"copy{i}.parquet"),
            )
        run_to_memory(builder(stream), name, output_mode=output_mode)
        return spark.table(name).cache()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_tumbling_batch_stream_equivalence(spark, batch_events):
    from randas_spark.streaming.engine import tumbling_counts

    batch = tumbling_counts(batch_events, width="1 hour")
    streamed = _run_stream(
        spark, lambda s: tumbling_counts(s, width="1 hour"), "t_tumbling"
    )
    assert _collect_sorted(streamed) == _collect_sorted(batch)


def test_sliding_batch_stream_equivalence(spark, batch_events):
    from randas_spark.streaming.engine import sliding_counts

    batch = sliding_counts(batch_events, width="10 minutes", slide="5 minutes")
    streamed = _run_stream(
        spark,
        lambda s: sliding_counts(s, width="10 minutes", slide="5 minutes"),
        "t_sliding",
    )
    assert _collect_sorted(streamed) == _collect_sorted(batch)


def test_session_batch_stream_equivalence(spark, batch_events):
    from randas_spark.streaming.engine import session_agg

    batch = session_agg(batch_events, gap="30 minutes")
    streamed = _run_stream(
        spark, lambda s: session_agg(s, gap="30 minutes"), "t_session"
    )
    assert _collect_sorted(streamed) == _collect_sorted(batch)


def test_watermark_is_applied(spark):
    """withWatermark must appear in the streaming plan as an
    EventTimeWatermark node (state eviction — the 100TB unbounded-state
    guard). On batch plans Spark eliminates it, so check the stream plan."""
    from randas_spark.streaming.engine import events_stream, tumbling_counts

    stream, stage = events_stream(spark, SF_DIR)
    try:
        out = tumbling_counts(stream, width="1 hour", watermark="2 hours")
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "EventTimeWatermark" in plan
        assert out.isStreaming
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_dedup_within_watermark_drops_replayed_file(spark, batch_events):
    """Feed the same events file twice in one trigger: every event_id is a
    duplicate → output must be exactly the distinct ids."""
    from randas_spark.streaming.engine import dedup_within_watermark

    n_distinct = batch_events.select("event_id").distinct().count()
    streamed = _run_stream(
        spark,
        lambda s: dedup_within_watermark(s, watermark="90 days"),
        "t_dedup",
        output_mode="append",
        copies=2,
    )
    assert streamed.count() == n_distinct
    assert streamed.select("event_id").distinct().count() == n_distinct


def test_foreach_batch_parquet_sink_replays_to_batch_result(spark, batch_events, tmp_path):
    """foreachBatch → parquet with checkpoint: the final state of the
    complete-mode aggregate (last batch's emission) must equal the batch
    aggregate, and the checkpoint dir must hold committed offsets."""
    from pyspark.sql import functions as F

    from randas_spark.streaming.engine import (
        events_stream,
        run_foreach_batch_to_parquet,
        tumbling_counts,
    )

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream, stage = events_stream(spark, SF_DIR)
    try:
        run_foreach_batch_to_parquet(
            tumbling_counts(stream, width="1 hour"),
            out_dir,
            ckpt,
            output_mode="complete",
        )
        written = spark.read.option("basePath", out_dir).parquet(out_dir)
        last_batch = written.agg(F.max("batch")).first()[0]
        final = written.filter(F.col("batch") == last_batch).drop("batch")
        batch = tumbling_counts(batch_events, width="1 hour")
        assert _collect_sorted(final) == _collect_sorted(batch)
        assert os.path.isdir(os.path.join(ckpt, "commits"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_running_user_state_matches_batch_agg(spark, batch_events):
    """applyInPandasWithState totals after the final trigger == plain batch
    groupBy totals (single trigger → one update row per user)."""
    from pyspark.sql import functions as F

    from randas_spark.streaming.engine import running_user_state

    batch = (
        batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    streamed = _run_stream(
        spark, running_user_state, "t_state", output_mode="update"
    )
    want = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in batch.collect()
    }
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in streamed.collect()
    }
    assert got == want
