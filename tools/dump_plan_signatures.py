"""Record a physical-plan signature for every registered batch query.

Writes PLAN_SIGNATURES.json: {query: {op: count}} for the operators
that matter at scale (Exchange, the join strategies, sorts, top-k).
`tests/test_plan_signatures.py` re-derives the signatures and fails on
DEGRADATIONS — a query that gains a CartesianProduct, falls from
broadcast to sort-merge, or acquires extra Exchanges — while allowing
strict improvements, so a global conf/code change can't silently
de-optimize a face that no per-query plan gate happens to cover.

Usage: PYTHONPATH=. python tools/dump_plan_signatures.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys

#: Ops whose appearance/inflation is a scale smell.
COUNTED = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "TakeOrderedAndProject",
)

#: Streaming faces execute real streams in their builders — signatures
#: are gated by their own semantics tests instead.
SKIP_PREFIXES = ("streaming_",)


def signature(plan: str) -> dict[str, int]:
    """Exact operator-token counts: `Exchange` must not also match
    BroadcastExchange/ReusedExchange (a broadcast improvement would
    read as a shuffle regression, and a real new shuffle could hide
    behind a removed broadcast)."""
    out = {}
    for op in COUNTED:
        n = len(re.findall(rf"(?<![A-Za-z]){op}(?![a-z])", plan))
        if n:
            out[op] = n
    return out


def collect(sf_dir: str) -> dict[str, dict[str, int]]:
    from mobility_etl_spark.registry import load_all
    from mobility_etl_spark.session import get_spark

    spark = get_spark("plan-signatures", master="local[8]", shuffle_partitions=8)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    out: dict[str, dict[str, int]] = {}
    for name, spec in sorted(load_all().items()):
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            out[name] = signature(plan)
        except Exception as exc:  # noqa: BLE001 - record, keep going
            out[name] = {"__error__": 1}
            print(f"[warn] {name}: {type(exc).__name__}", file=sys.stderr)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sigs = collect(sf_dir)
    with open("PLAN_SIGNATURES.json", "w") as fh:
        json.dump({"sf_dir": sf_dir, "signatures": sigs}, fh, indent=1, sort_keys=True)
    print(f"PLAN_SIGNATURES.json written ({len(sigs)} queries)")


if __name__ == "__main__":
    main()
