"""Repo-wide plan-signature canary.

`PLAN_SIGNATURES.json` (tools/dump_plan_signatures.py) pins a physical
-plan signature for every batch face. This test re-derives them and
fails on DEGRADATIONS — a face that gains a CartesianProduct, acquires
nested-loop joins it didn't have, falls from broadcast to sort-merge,
or grows extra Exchanges. Strict improvements (fewer shuffles, a
nested-loop join becoming hashable) pass; after an intentional plan
change, regenerate the baseline with the dump tool and review the
diff in the commit.

This is the drift-canary idea applied to plans: the per-query gates in
test_plans.py cover ~25 load-bearing faces; this covers all of them
against global regressions (a conf default flip, a helper rewrite)
that no individual gate happens to watch.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from mobility_etl_spark.registry import load_all
from tools.dump_plan_signatures import COUNTED, SKIP_PREFIXES, signature

BASELINE_PATH = pathlib.Path(__file__).resolve().parent.parent / "PLAN_SIGNATURES.json"

#: Ops whose count may not INCREASE vs the committed baseline.
NO_WORSE = (
    "Exchange",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


@pytest.fixture(scope="module")
def baseline() -> dict[str, dict[str, int]]:
    with open(BASELINE_PATH) as fh:
        return json.load(fh)["signatures"]


def _names():
    return [
        n for n in sorted(load_all()) if not n.startswith(SKIP_PREFIXES)
    ]


@pytest.mark.parametrize("name", _names())
def test_plan_signature_no_degradation(spark, sf_dir, name, baseline):
    spec = load_all()[name]
    df = spec.builder(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    current = signature(df._jdf.queryExecution().explainString(mode))
    base = baseline.get(name)
    if base is None:
        # face newer than the committed baseline: regenerate the dump.
        # Until then, only the absolute smell is gated.
        assert not current.get("CartesianProduct"), (
            f"{name}: new face plans a CartesianProduct; "
            "run tools/dump_plan_signatures.py and justify it"
        )
        return
    for op in NO_WORSE:
        assert current.get(op, 0) <= base.get(op, 0), (
            f"{name}: {op} count grew {base.get(op, 0)} -> "
            f"{current.get(op, 0)} — a plan degradation. If intentional, "
            "regenerate PLAN_SIGNATURES.json and review the diff."
        )
