"""Round-10 scale-stress measurements (VERDICT r9 #4): repeat the
method that caught the BPE partition snowball on the remaining
iterative/streaming operators —

1. STREAMING NEAR-DUP INGEST as the index grows: per-batch wall clock
   over 30 micro-batches in three index modes (raw directory,
   snapshot-no-compaction, snapshot+compact_every=4). The claim the
   compactor exists to buy: per-batch cost stays FLAT because the
   probe side's file count stays flat.
2. PAGERANK per-iteration cost at sf0.01 vs sf0.1 (10x lineitem), with
   partition-width telemetry per round (the snowball detector).
3. K-CORE per-peel-round cost at sf0.01 vs sf0.1, same telemetry.

Prints a JSON document; paste the summary rows into SCALING.md.

    PYTHONPATH=. python tools/bench_stress_r10.py
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def neardup_growth(spark, sf_dir: str) -> dict:
    from mobility_etl_spark.io import load_table
    from mobility_etl_spark.streaming.jobs import (
        init_near_dup_index,
        near_dup_apply_batch,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    init_n, batch_sz = 200, 60
    n_batches = min(30, (n - init_n) // batch_sz)

    # warmup: two throwaway batches on a scratch root so JVM/codegen/
    # footer-cache cold-start lands outside every mode's first5 window
    wroot = tempfile.mkdtemp(prefix="ndup_stress_warm_")
    init_near_dup_index(
        emb.filter(F.col("vec_id") < init_n), os.path.join(wroot, "idx")
    )
    for b in range(2):
        lo = init_n + b * batch_sz
        near_dup_apply_batch(
            spark,
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + batch_sz)
            ),
            b,
            os.path.join(wroot, "idx"),
            os.path.join(wroot, "dec"),
            threshold=0.9,
        )
    shutil.rmtree(wroot, ignore_errors=True)
    out: dict = {"n_vectors": n, "n_batches": n_batches,
                 "batch_size": batch_sz, "modes": {}}
    for mode, snap, compact in (
        ("dir", False, 0),
        ("snap_nocompact", True, 0),
        ("snap_compact4", True, 4),
    ):
        root = tempfile.mkdtemp(prefix=f"ndup_stress_{mode}_")
        index = os.path.join(root, "idx")
        init_near_dup_index(
            emb.filter(F.col("vec_id") < init_n), index, snapshot=snap
        )
        walls, files = [], []
        for b in range(n_batches):
            lo = init_n + b * batch_sz
            batch = emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + batch_sz)
            )
            n_files = sum(
                1
                for _, _, fs in os.walk(index)
                for f in fs
                if f.endswith(".parquet")
            )
            t0 = time.monotonic()
            near_dup_apply_batch(
                spark,
                batch,
                b,
                index,
                os.path.join(root, "dec"),
                threshold=0.9,
                index_snapshots=snap,
                compact_every=compact,
            )
            walls.append(round(time.monotonic() - t0, 3))
            files.append(n_files)
        shutil.rmtree(root, ignore_errors=True)
        out["modes"][mode] = {
            "per_batch_s": walls,
            "index_files_before_batch": files,
            "first5_avg_s": round(sum(walls[:5]) / 5, 3),
            "last5_avg_s": round(sum(walls[-5:]) / 5, 3),
            "final_index_files": files[-1],
        }
    return out


def graph_rounds(spark, sf_dirs: list[str]) -> dict:
    from mobility_etl_spark.io import load_table
    from mobility_etl_spark.operators.components import k_core
    from mobility_etl_spark.operators.pagerank import pagerank

    out: dict = {"pagerank": {}, "kcore": {}}
    for sf_dir in sf_dirs:
        li = load_table(spark, sf_dir, "lineitem")
        pairs = li.select("l_partkey", "l_suppkey").distinct()
        fwd = pairs.select(
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        edges = fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        stats: list = []
        t0 = time.monotonic()
        pagerank(edges, iters=8, stats=stats).write.format("noop").mode(
            "overwrite"
        ).save()
        out["pagerank"][sf_dir] = {
            "total_s": round(time.monotonic() - t0, 3),
            "n_edges": edges.count(),
            "rounds": [
                {k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in r.items()}
                for r in stats
            ],
        }

        a = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
        )
        b = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
        )
        kedges = (
            a.join(b, "ok")
            .filter(F.col("u") < F.col("v"))
            .select("u", "v")
            .distinct()
            .filter(
                (((F.col("u") * 100003 + F.col("v")) % 1000003)
                 * F.lit(2654435761))
                % 1000000007
                % 23
                == 0
            )
        )
        kstats: list = []
        t0 = time.monotonic()
        k_core(kedges, k=3, stats=kstats).write.format("noop").mode(
            "overwrite"
        ).save()
        out["kcore"][sf_dir] = {
            "total_s": round(time.monotonic() - t0, 3),
            "n_edges": kedges.count(),
            "rounds": [
                {k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in r.items()}
                for r in kstats
            ],
        }
    return out


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    from mobility_etl_spark.session import get_spark

    spark = get_spark(
        "stress-r10",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    result = {
        "neardup_growth_sf01": neardup_growth(spark, "/root/testdata/sf0.1"),
        "graph_rounds": graph_rounds(
            spark, ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
        ),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
