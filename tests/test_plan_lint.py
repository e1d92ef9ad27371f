"""Registry-wide physical-plan lint: no unbroadcast cross joins, no
row-at-a-time Python UDFs — anywhere, not just the headline set. Keeps
every future operator inside the scale policy the per-round perf audit
checks by hand (tools/plan_lint.py is the standalone form).
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_no_plan_antipatterns_across_registry(spark):
    import __spark_entry__ as e
    from tools.plan_lint import lint

    qs = e.queries()
    findings, allowed, errors = lint(spark, qs, SF_DIR, list(qs))
    assert not errors, errors
    # every allowed exception must carry a reason (ALLOW is the only door)
    assert all(a.get("reason") for a in allowed)
    assert findings == [], findings
