"""Dump explain('formatted') for the r15-touched queries to
plans/r15/<query>_{before,after}.txt.

Usage: python tools/dump_r15_plans.py <before|after> [query ...]
Defaults to the full r15 touch list. sf_dir from $SPARK_GRAFT_SF_DIR
(default sf0.001 — plan shape, not timing).
"""

from __future__ import annotations

import os
import sys

QUERIES = [
    "pipeline_pretraining_stream",
    "snapshot_change_feed",
    "snapshot_change_feed_ivm",
    "minhash_near_dup",
    "network_kcore_parts",
    "sketch_theta_overlap_matrix",
]


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), tag
    names = sys.argv[2:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from mobility_etl_spark.registry import load_all
    from mobility_etl_spark.session import get_spark

    spark = get_spark("plan-dump-r15", master="local[8]", shuffle_partitions=8)
    specs = load_all()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        je = df._jdf.queryExecution()
        plan = je.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted'), {tag}, sf_dir={sf_dir}\n"
            )
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
