"""Walk every registered query's physical plan and report Window-family
nodes whose partitionSpec is empty (global windows: at scale the whole
input funnels through ONE task unless the input is provably bounded).

Usage: python -m tools.audit_windows [--sf DIR] [name ...]
Prints one line per (face, node) with the node's simpleString prefix.
"""

from __future__ import annotations

import sys

from mobility_etl_spark.registry import load_all
from mobility_etl_spark.session import get_spark


def iter_nodes(jnode):
    yield jnode
    ch = jnode.children()
    for i in range(ch.size()):
        yield from iter_nodes(ch.apply(i))
    subs = jnode.subqueries()
    for i in range(subs.size()):
        yield from iter_nodes(subs.apply(i))


def unpartitioned_windows(df) -> list[str]:
    """simpleString of every Window-family physical node with an empty
    partitionSpec in df's (pre-AQE) physical plan, subqueries included."""
    plan = df._jdf.queryExecution().sparkPlan()
    hits = []
    for node in iter_nodes(plan):
        cls = node.getClass().getSimpleName()
        if "Window" in cls and hasattr(node, "partitionSpec"):
            if node.partitionSpec().isEmpty():
                hits.append(f"{cls}: {node.simpleString(120)}")
    return hits


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark()
    specs = load_all()
    names = args or sorted(specs)
    flagged = 0
    for name in names:
        try:
            df = specs[name].builder(spark, sf)
            hits = unpartitioned_windows(df)
        except Exception as e:  # builder needs env not present here
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            continue
        if hits:
            flagged += 1
            for h in hits:
                print(f"[GLOB] {name}: {h[:200]}")
    print(f"\n{flagged}/{len(names)} faces with unpartitioned Window nodes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
