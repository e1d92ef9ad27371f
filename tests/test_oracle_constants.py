"""Guard the streaming twin-constants against stray cross-query edits.

Round-6 incident: a find/replace that introduced the CEP funnel's 24-hour
horizon (86400000000 us) also rewrote the *unrelated* session-window
oracle's 30-minute gap (1800000000 us) in the same file, turning the
correctness board red (VERDICT r6 item 1).  The oracle SQL and the Spark
builder each carry the duration independently — SQL as a raw microsecond
literal, Spark as a duration string — so nothing structural ties them
together.  These tests are that tie: they parse the literals out of the
registered oracle text and the Spark-side source and assert each pair is
equal, so editing either side alone fails the suite.
"""

from __future__ import annotations

import inspect
import re

from randas_spark.queries import REGISTRY, load_all
from randas_spark.streaming import engine

load_all()


def _oracle(name: str) -> str:
    qd = REGISTRY[name]
    assert qd.oracle is not None, f"{name} lost its oracle"
    return qd.oracle


def _us_literals(sql: str) -> set[int]:
    """All >=9-digit integer literals (microsecond durations) in the SQL."""
    return {int(m) for m in re.findall(r"\b(\d{9,})\b", sql)}


def test_session_window_gap_is_30_minutes_on_both_sides():
    sql = _oracle("stream_session_window")
    # Oracle side: the new-session predicate gap and the sess_end extension.
    assert _us_literals(sql) == {1_800_000_000}, (
        "session-window oracle gap literal drifted from 30 minutes"
    )
    assert "INTERVAL 30 MINUTE" in sql
    # Spark side: the builder must request the same gap.
    src = inspect.getsource(REGISTRY["stream_session_window"].fn)
    assert 'gap="30 minutes"' in src
    sig = inspect.signature(engine.session_agg)
    assert sig.parameters["gap"].default == "30 minutes"


def test_funnel_horizon_is_24_hours_on_both_sides():
    sql = _oracle("stream_pattern_funnel")
    assert _us_literals(sql) == {engine._FUNNEL_STEP_US}, (
        "funnel oracle horizon literals disagree with engine._FUNNEL_STEP_US"
    )
    assert engine._FUNNEL_STEP_US == 86_400_000_000  # 24 h per step


def test_no_other_streaming_oracle_carries_a_us_duration_literal():
    """Any NEW microsecond literal in a streaming oracle must be added to
    this map deliberately — an unlisted one is presumed a stray edit."""
    expected = {
        "stream_session_window": {1_800_000_000},
        "stream_pattern_funnel": {86_400_000_000},
    }
    for name, qd in REGISTRY.items():
        if not name.startswith("stream_") or qd.oracle is None:
            continue
        lits = _us_literals(qd.oracle)
        assert lits == expected.get(name, set()), (
            f"{name}: unexpected microsecond literals {lits} — if deliberate, "
            "register them in tests/test_oracle_constants.py"
        )
