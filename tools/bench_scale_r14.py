"""VERDICT r13 #3: scale-curve the remaining LLM-pipeline faces past
sf0.1. The semdedup lesson from r13 (a fixed cluster cap re-quadratized
in-cluster pairs at 400k vectors) generalizes: these five faces had
never been measured past sf0.1, so any super-linear term in them would
first surface on a cluster, not here.

Reuses the seed-deterministic shifted-replication generator from
tools/bench_scale_r13.py (documents/embeddings replicate too; replicated
embeddings get the deterministic perturbation so near-dup workloads stay
corpus-shaped, not dup-bombs), then times each face with the bench
protocol (1 warm-up + median of 3) at the given copies multiplier.

    PYTHONPATH=. python tools/bench_scale_r14.py [out_dir] [copies]

copies=10 → sf1-equivalent (~500k docs / 20k vectors);
copies=100 → sf10-equivalent (~5M docs / 200k vectors).
Summary rows go to SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: the five faces VERDICT r13 #3 names, plus the raw-sf0.1 timings'
#: natural companions measured at every scale for slope context
FACES = (
    "minhash_near_dup",
    "span_dedup_ngram_docs",
    "near_dup_lsh_embeddings",
    "tokenizer_train_bpe",
    "network_kcore_parts",
)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_equiv"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from mobility_etl_spark.session import get_spark
    from tools.bench_scale_r13 import SHIFT_COLS, COPY_AS_IS, generate

    spark = get_spark(
        "bench-scale-r14",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

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
            json.dump({"copies": copies, "src": "sf0.1"}, fh)
        print(f"generation: {time.perf_counter() - t:.1f}s", flush=True)

    import bench
    from mobility_etl_spark.registry import load_all

    specs = load_all()
    timings: dict[str, float] = {}
    # copies>10: single timed pass per face (the r13 protocol for the
    # sf10-equivalent) — at this volume run-to-run noise is a rounding
    # error next to the slope being measured, and 3 reps of a
    # multi-minute face would dominate the round's wall-clock budget
    n_reps = 3 if copies <= 10 else 1
    for name in FACES:
        bench.reset_state_caches()
        specs[name].builder(spark, out_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm-up
        reps = []
        for _ in range(n_reps):
            bench.reset_state_caches()
            t = time.perf_counter()
            specs[name].builder(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t, 3))
        reps.sort()
        timings[name] = reps[len(reps) // 2]
        print(f"{name}: {timings[name]} {reps}", flush=True)

    print(
        json.dumps(
            {
                "sf": f"{copies}x sf0.1 shifted replication",
                "queries": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
