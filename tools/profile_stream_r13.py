"""Per-stage profile of the STREAMING pretraining capstone (VERDICT
r12 #1): where does `pipeline_pretraining_stream`'s wall clock go, and
which r12 additions (per-batch broadcast cycle, row-cap compaction
cadence, drain round-trip) cost what?

Drives the capstone exactly as the bench face does (4 micro-batches,
compact_every=8, sf from $SPARK_GRAFT_SF_DIR) and aggregates
streaming/jobs.py:STAGE_TIMINGS — the always-on per-stage stamps
inside pretraining_apply_batch and the maintenance loop — into the
SCALING.md table. Run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        PYTHONPATH=. python tools/profile_stream_r13.py
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    n_passes = int(os.environ.get("PROFILE_PASSES", "1"))

    from mobility_etl_spark.session import get_spark

    spark = get_spark(
        "profile-stream-r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.sql.files.openCostInBytes": "64k",
        },
    )

    import bench
    from mobility_etl_spark.queries.corpus_prep import (
        _SEM_TAU,
        run_pretraining_stream,
    )
    from mobility_etl_spark.streaming import jobs

    from mobility_etl_spark.streaming.jobs import pretraining_finalize

    for p in range(n_passes):
        bench.reset_state_caches()
        jobs.STAGE_TIMINGS.clear()

        t_all = time.perf_counter()
        root = run_pretraining_stream(
            spark, sf_dir, n_files=4, compact_every=8
        )
        t_stream = time.perf_counter() - t_all

        t_fin = time.perf_counter()
        pretraining_finalize(spark, root).write.format("noop").mode(
            "overwrite"
        ).save()
        t_fin = time.perf_counter() - t_fin
        t_all = time.perf_counter() - t_all

        # aggregate per stage across epochs; epoch -1 = setup stamps
        # (setup:stream-drive CONTAINS the per-batch stamps — the
        # difference is the Structured Streaming trigger machinery)
        agg: dict[str, float] = {}
        per_epoch: dict[int, float] = {}
        for e in jobs.STAGE_TIMINGS:
            agg[e["stage"]] = agg.get(e["stage"], 0.0) + e["s"]
            if e["epoch"] >= 0:
                per_epoch[e["epoch"]] = (
                    per_epoch.get(e["epoch"], 0.0) + e["s"]
                )
        batch_stamped = sum(per_epoch.values())
        trigger_overhead = agg.get("setup:stream-drive", 0.0) - batch_stamped

        print(f"\n=== pass {p} | sf_dir={sf_dir} ===")
        print(f"{'stage':<28}{'total_s':>9}")
        for stage, s in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"{stage:<28}{s:>9.3f}")
        print(f"{'-- batch stamped subtotal':<28}{batch_stamped:>9.3f}")
        print(f"{'-- trigger machinery':<28}{trigger_overhead:>9.3f}")
        print(f"{'-- stream wall':<28}{t_stream:>9.3f}")
        print(f"{'-- finalize':<28}{t_fin:>9.3f}")
        print(f"{'-- TOTAL (face)':<28}{t_all:>9.3f}")
        print("per-epoch stamped:", {
            k: round(v, 3) for k, v in sorted(per_epoch.items())
        })
        print(json.dumps({
            "pass": p,
            "stages": {k: round(v, 3) for k, v in agg.items()},
            "trigger_overhead": round(trigger_overhead, 3),
            "stream_wall": round(t_stream, 3),
            "finalize": round(t_fin, 3),
            "total": round(t_all, 3),
        }))

    spark.stop()


if __name__ == "__main__":
    main()
