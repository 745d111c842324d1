"""Unit tests for the plan-regression gate's compare logic
(tools/plan_audit.py::check_regressions) — pure-function, no Spark.

The gate is load-bearing in the pre-ship checklist: a silent
broadcast->SMJ flip (exchanges+1), a new cartesian, or Python eval
appearing in a previously JVM-only plan must fail the check, while
baselining new queries and tolerating improvements must not.
"""

import importlib.util
import os
import sys

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _TOOLS)

_spec = importlib.util.spec_from_file_location(
    "plan_audit", os.path.join(_TOOLS, "tools", "plan_audit.py")
)
plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_audit)
check_regressions = plan_audit.check_regressions


def _plan(**over):
    base = {
        "pushed": True,
        "codegen_spans": 3,
        "broadcast_joins": 1,
        "shuffle_joins": 0,
        "exchanges": 2,
        "partial_agg": True,
        "cartesian": False,
        "bnlj": False,
        "python_eval": False,
    }
    base.update(over)
    return base


def test_clean_compare_passes():
    old = {"q": _plan()}
    assert check_regressions(old, {"q": _plan()}) == []


def test_worsening_metrics_fail():
    old = {"q": _plan()}
    assert check_regressions(old, {"q": _plan(exchanges=3)})  # extra shuffle
    assert check_regressions(old, {"q": _plan(cartesian=True)})
    assert check_regressions(old, {"q": _plan(bnlj=True)})
    assert check_regressions(old, {"q": _plan(python_eval=True)})


def test_improvements_and_new_queries_pass():
    old = {"q": _plan(exchanges=3, python_eval=True)}
    new = {"q": _plan(exchanges=1, python_eval=False), "brand_new": _plan()}
    assert check_regressions(old, new) == []


def test_error_rows_and_meta_handling():
    old = {"q": _plan()}
    # a query that errored in the fresh audit is always a failure
    assert check_regressions(old, {"q": None})
    # the _meta block (sf dir) is not a query row
    assert check_regressions(old, {"_meta": {"sf": "x"}, "q": _plan()}) == []


def test_booleans_not_treated_as_counters():
    # bool is an int subclass; a True->True plan must not read as "1 > 0"
    old = {"q": _plan(python_eval=True, cartesian=False)}
    assert check_regressions(old, {"q": _plan(python_eval=True)}) == []
