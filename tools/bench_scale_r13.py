"""VERDICT r12 #4: pin the NEXT 10x of the scale curve. SCALING.md's
core8 table stopped at sf0.1; this tool generates a seed-deterministic
sf1-EQUIVALENT (~6M lineitem / 1.5M orders / 1M events / 50k docs /
20k embeddings) by shifted replication of the driver's sf0.1 tables —
no RNG state anywhere: copy i shifts every key column by i * (max+1)
computed from the source data, so reruns are byte-identical — then
runs the CORE8 (warm-up + timed, the bench protocol) plus
asof_join_events (already in core8) and the BATCH pretraining capstone
once, and prints the table row SCALING.md records.

Replicated embeddings get a DETERMINISTIC per-copy perturbation
(element j += ((i*37 + j*13) % 211 - 105) * 2e-4) so the semantic-dedup
stage sees distinct vectors rather than 90% exact duplicates — the
workload stays shaped like a corpus, not like a degenerate dup-bomb.

    PYTHONPATH=. python tools/bench_scale_r13.py [out_dir] [copies]

``copies`` defaults to 10 (sf1-equivalent); 100 gives an
sf10-equivalent (~60M lineitem / 10M events / 200k embeddings). At
copies >= 100 the batch pretraining capstone is SKIPPED by design: its
semantic stage is the exact all-pairs baseline (an n x n gram — 320 GB
at 200k vectors), whose documented 100 TB path is the
cluster-then-compare face; `vector_semantic_dedup` is measured at
every scale instead to pin THAT slope.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COPIES = 10
SRC = "/root/testdata/sf0.1"

#: per-table key columns shifted by i * (max+1) per copy; empty dict =
#: replicate verbatim (the row count still scales: events per user,
#: lineitems per order etc. stay constant because their parents shift
#: in lockstep with the same multiplier).
SHIFT_COLS = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "part": ("p_partkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
COPY_AS_IS = ("region", "nation")

#: key spaces must shift in LOCKSTEP across tables (a lineitem's
#: shifted l_orderkey must land on the same copy's shifted o_orderkey)
#: so the shift unit comes from the key's OWNING table.
KEY_OWNER = {
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "p_partkey": ("part", "p_partkey"),
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("documents", "doc_id"),  # vec ids live in doc-id space
}


def generate(spark, out_dir: str, copies: int = COPIES) -> None:
    units: dict[tuple[str, str], int] = {}

    def unit(col: str) -> int:
        owner = KEY_OWNER[col]
        if owner not in units:
            tbl, own_col = owner
            units[owner] = (
                spark.read.parquet(f"{SRC}/{tbl}.parquet")
                .agg(F.max(own_col))
                .first()[0]
                + 1
            )
        return units[owner]

    for name in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")

    for name, cols in SHIFT_COLS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(copies):
            c = df
            for col in cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * unit(col)))
            if name == "embeddings" and i > 0:

                def _perturb(copy_i):
                    # factory, not a default arg: pyspark derives the
                    # higher-order function's arity from the lambda's
                    # Python signature
                    def f(x, j):
                        return (
                            x
                            + ((F.lit(copy_i * 37) + j * 13) % 211 - 105)
                            * 2e-4
                        ).cast("float")

                    return f

                c = c.withColumn(
                    "embedding", F.transform("embedding", _perturb(i))
                )
            parts.append(c)
        functools.reduce(DataFrame.unionAll, parts).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"generated {name}: {n} rows", flush=True)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_equiv"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from mobility_etl_spark.session import get_spark

    spark = get_spark(
        "bench-scale-r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # 10x the data: the bench harness's 1m split sizing would make
        # ~3500 scan tasks; at this volume the defaults behave like
        # the cluster case, so keep them.
    )

    # regenerate when any table is missing OR the existing data was
    # generated at a DIFFERENT copies value — otherwise a rerun with a
    # new scale silently benchmarks the old data under the new label
    expected = list(SHIFT_COLS) + list(COPY_AS_IS)
    marker = f"{out_dir}/_copies.json"
    existing = None
    if os.path.exists(marker):
        with open(marker) as fh:
            existing = json.load(fh).get("copies")
    if existing != copies or not all(
        os.path.exists(f"{out_dir}/{t}.parquet") for t in expected
    ):
        t = time.perf_counter()
        generate(spark, out_dir, copies)
        with open(marker, "w") as fh:
            json.dump({"copies": copies, "src": SRC}, fh)
        print(f"generation: {time.perf_counter() - t:.1f}s", flush=True)

    import bench
    from mobility_etl_spark.registry import load_all

    specs = load_all()
    timings: dict[str, float] = {}
    for name in bench.CORE8:
        specs[name].builder(spark, out_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm-up (bench protocol)
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            specs[name].builder(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(time.perf_counter() - t)
        reps.sort()
        timings[name] = round(reps[1], 3)
        print(f"{name}: {timings[name]} {reps}", flush=True)

    # the batch capstone's semantic stage is the exact all-pairs
    # BASELINE (n x n gram — 320 GB at 200k vectors); past copies=10
    # only its declared scale path, cluster-then-compare
    # vector_semantic_dedup, is meaningful to measure
    extras = ["vector_semantic_dedup"]
    if copies <= 10:
        extras.insert(0, "pipeline_pretraining_full")
    for name in extras:
        bench.reset_state_caches()
        t = time.perf_counter()
        specs[name].builder(spark, out_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t, 3)
        print(f"{name}: {timings[name]}", flush=True)

    core8 = round(sum(timings[n] for n in bench.CORE8), 3)
    print(
        json.dumps(
            {
                "sf": f"{copies}x sf0.1 shifted replication",
                "core8": core8,
                "queries": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
