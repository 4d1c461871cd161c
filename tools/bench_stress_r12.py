"""Round-12 scale-stress measurements (VERDICT r11 #2/#5/#6):

1. SKEW JOIN STRESS (#5): hour_bucket_join- and star-join-shaped
   queries on 2M rows with UNIFORM keys vs a ZIPF hot key (~35% of
   mass on one key), broadcast disabled so the sort-merge path (the
   one that suffers skew at 100 TB) is exercised, AQE on (session
   defaults). Claim: AQE skew-splitting keeps the skewed wall-clock
   within 2x of uniform; the salted operator is the escape hatch past
   that. Reports wall-clocks, the ratio, and whether AQE's skew split
   triggered.

2. PROBE CURVE TO 1e6, SKEWED GEOMETRY (#2): the r11 curve stopped at
   1e5 uniform-mixture vectors, one file per cell. Real corpora are
   Zipf-skewed; here cluster masses follow alpha=1.1 over 64 cells
   (hot cell ~30-40%). Measures the pruned probe per batch at 1e5 ..
   1e6 index vectors in BOTH layouts — one-file-per-cell (r11) vs
   row-capped secondary-split files (r12 max_file_rows +
   layout_secondary=("ccos",)) — plus the survivor-scan partition
   width (max file rows touched). Claim: the cap bounds the widest
   survivor file and the per-batch probe stays flat while the full
   scan grows linearly.

3. CAPSTONE SOAK (#6): 100 micro-batches of 1k docs through
   pretraining_apply_batch + maintenance (compaction cadence as in
   pretraining_stream_ingest), 1e5-vector final index. Records
   per-batch wall-clock, tip file counts, retained manifest counts,
   and driver RSS at batches 1/25/50/100. Claim: all flat or
   logarithmic — no state the stream accretes without bound.

Prints a JSON document; summary rows go to SCALING.md.

    PYTHONPATH=. python tools/bench_stress_r12.py [skew|probe|soak|all]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F


def _rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


# ------------------------------------------------------------ 1: skew


def skew_join_stress(spark, n=2_000_000, n_keys=1_000) -> dict:
    """Uniform vs Zipf-hot keys through the two headline join shapes,
    SMJ path (broadcast off), AQE skew split on."""
    out: dict = {}
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    dim.write.mode("overwrite").format("noop").save()

    def build(kind):
        base = spark.range(n)
        if kind == "uniform":
            k = F.col("id") % n_keys
        else:  # zipf-ish: ~35% of rows on key 7, power tail elsewhere
            k = F.when(F.col("id") % 3 == 0, F.lit(7)).otherwise(
                F.least(
                    (
                        F.lit(1.0)
                        / F.pow(
                            (F.col("id") % 99991 + 1) / 99991.0, 1.1
                        )
                    ).cast("long"),
                    F.lit(n_keys - 1),
                )
            )
        return base.select(
            k.alias("k"),
            (F.col("id") % 24).alias("hour"),
            (F.col("id") % 97).cast("double").alias("v"),
        )

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Scale AQE's skew thresholds to THIS data size (2M rows ≈ 30 MB
    # shuffled; the hot partition ≈ 11 MB — under the 256 MB default
    # that is tuned for production shuffles). At 100 TB the defaults
    # are correct as-is; this exercises the identical mechanism.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "4MB",
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB"
    )
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
    )
    try:
        for kind in ("uniform", "zipf"):
            ev = build(kind)
            joined = ev.join(dim, ["k"])
            agg = joined.groupBy("hour").agg(
                F.sum("v").alias("sv"), F.sum("w").alias("sw")
            )
            gb = ev.groupBy("k").agg(F.sum("v").alias("sv"))
            # warm-up pass (codegen + shuffle services), then timed
            agg.write.mode("overwrite").format("noop").save()
            gb.write.mode("overwrite").format("noop").save()
            t0 = time.perf_counter()
            agg.write.mode("overwrite").format("noop").save()
            out[f"join_{kind}_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            gb.write.mode("overwrite").format("noop").save()
            out[f"groupby_{kind}_s"] = round(time.perf_counter() - t0, 3)
        # did AQE's skew split trigger on the zipf join? (execute the
        # DataFrame's OWN plan — a write/count builds a separate
        # QueryExecution and leaves this one unfinalized; thresholds
        # down to the compressed size of the hot shuffle partition)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB"
        )
        coal = spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled"
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        try:
            # fresh 300k build (a .limit() would funnel the scan
            # through one partition and mask the skew)
            ev = spark.range(300_000).select(
                F.when(F.col("id") % 3 != 0, F.lit(7))
                .otherwise(F.col("id") % n_keys)
                .alias("k"),
                (F.col("id") % 24).alias("hour"),
                (F.col("id") % 97).cast("double").alias("v"),
            )
            joined = ev.join(dim, ["k"])
            joined.collect()
            plan = (
                joined._jdf.queryExecution().executedPlan().toString()
            )
            out["aqe_skew_split_triggered"] = "skew=true" in plan
        finally:
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", coal
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    out["join_ratio"] = round(
        out["join_zipf_s"] / out["join_uniform_s"], 2
    )
    out["groupby_ratio"] = round(
        out["groupby_zipf_s"] / out["groupby_uniform_s"], 2
    )
    out["within_2x"] = out["join_ratio"] <= 2.0
    return out


# ----------------------------------------------------------- 2: probe


def _zipf_mixture(n, d=64, k=64, alpha=1.1, spread=0.03, seed=12):
    """Mixture on the sphere with Zipf(alpha) cluster masses — the hot
    cluster holds ~1/H(k,alpha) of all vectors (~30-40% at k=64)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    w = 1.0 / np.arange(1, k + 1) ** alpha
    w /= w.sum()
    assign = rng.choice(k, size=n, p=w)
    v = centers[assign] + spread * rng.randn(n, d)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float64), centers


def _write_index(spark, root, vecs, centers, capped: bool):
    """Land the vectors as a stats-committed snapshot index; capped
    layout uses the r12 row-cap + ccos secondary split."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mobility_etl_spark.operators.snapshots import (
        _list_versions,
        commit_snapshot,
        compact_snapshot,
    )

    os.makedirs(root, exist_ok=True)
    # fast bulk land: pyarrow straight to one parquet (createDataFrame
    # over 1e6 python lists is minutes of driver time)
    sims = vecs @ centers.T
    cell = sims.argmax(axis=1).astype(np.int32)
    ccos = sims[np.arange(len(vecs)), cell]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), type=pa.list_(pa.float32())
            ),
            "cell": pa.array(cell, type=pa.int32()),
            "ccos": pa.array(ccos, type=pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(root, "land-0.parquet"))
    commit_snapshot(
        spark, root, note="land", stats_cols=("cell", "ccos", "doc_id")
    )
    kw = (
        dict(layout_secondary=("ccos",), max_file_rows=25_000)
        if capped
        else {}
    )
    compact_snapshot(
        spark,
        root,
        layout_col="cell",
        layout_files=64,
        stats_cols=("cell", "ccos", "doc_id"),
        **kw,
    )
    return _list_versions(root)[-1]


def probe_curve_1e6(spark, sizes=(100_000, 300_000, 1_000_000)) -> dict:
    from mobility_etl_spark.operators import similarity as sim

    # tau high enough that hits are ~self-matches only: at tau=0.6
    # EVERY in-cluster pair is a hit and the measurement drowns in
    # result materialization (millions of output rows) instead of
    # the scan/prune cost this curve is about
    tau = 0.999

    out: dict = {"sizes": list(sizes), "points": []}
    for n in sizes:
        vecs, centers = _zipf_mixture(n)
        # TWO query shapes: "diverse" (1k rows drawn across the whole
        # corpus — reaches every cell; cost honestly tracks reachable
        # pairs) and "local" (1k rows around ONE mid cluster — the
        # capstone's cluster-local admission shape; the pruning claim
        # is THIS batch stays flat as the index grows)
        q_diverse = vecs[:: max(1, n // 1000)][:1000].copy()
        sims_all = vecs @ centers.T
        cell_all = sims_all.argmax(axis=1)
        local_idx = np.nonzero(cell_all == 5)[0][:1000]
        q_local = vecs[local_idx].copy()
        base = tempfile.mkdtemp(prefix=f"probe12-{n}-")
        point: dict = {"n": n}

        def _inc_df(qv):
            return spark.createDataFrame(
                [
                    (10_000_000 + i, [float(x) for x in v])
                    for i, v in enumerate(qv)
                ],
                "doc_id long, embedding array<float>",
            )

        try:
            for layout in ("percell", "capped"):
                root = os.path.join(base, layout)
                ver = _write_index(
                    spark, root, vecs, centers, capped=layout == "capped"
                )
                man = sim._load_manifest(root, ver)
                widths = [
                    st.get("_rows", 0)
                    for st in man.get("stats", {}).values()
                ]
                point[f"{layout}_files"] = len(man["files"])
                point[f"{layout}_max_file_rows"] = max(widths or [0])
                for qname, qv in (
                    ("diverse", q_diverse),
                    ("local", q_local),
                ):
                    inc = _inc_df(qv)
                    probe_df = sim.exact_probe_blas_pruned(
                        spark, inc, root, ver, centers, tau
                    )
                    probe_df.write.mode("overwrite").format(
                        "noop"
                    ).save()  # warm-up (codegen, footers)
                    for k in sim.PROBE_PRUNE_STATS:
                        sim.PROBE_PRUNE_STATS[k] = 0
                    t0 = time.perf_counter()
                    sim.exact_probe_blas_pruned(
                        spark, inc, root, ver, centers, tau
                    ).write.mode("overwrite").format("noop").save()
                    point[f"{layout}_{qname}_pruned_s"] = round(
                        time.perf_counter() - t0, 3
                    )
                    s = sim.PROBE_PRUNE_STATS
                    point[f"{layout}_{qname}_file_skip"] = round(
                        1 - s["files_kept"] / max(1, s["files_total"]),
                        3,
                    )
                    point[f"{layout}_{qname}_pair_skip"] = round(
                        1 - s["qf_kept"] / max(1, s["qf_total"]), 3
                    )
                    sim.release_probe_state()
            # full-scan reference on the capped layout
            from mobility_etl_spark.operators.snapshots import (
                read_snapshot,
            )

            corpus = read_snapshot(spark, os.path.join(base, "capped"))
            inc = _inc_df(q_local)
            sim.exact_probe_blas(inc, corpus, tau).write.mode(
                "overwrite"
            ).format("noop").save()  # warm-up
            t0 = time.perf_counter()
            sim.exact_probe_blas(inc, corpus, tau).write.mode(
                "overwrite"
            ).format("noop").save()
            point["full_local_s"] = round(time.perf_counter() - t0, 3)
            sim.release_probe_state()
        finally:
            shutil.rmtree(base, ignore_errors=True)
        out["points"].append(point)
    return out


# ------------------------------------------------------------ 3: soak


def capstone_soak(spark, n_batches=100, batch_rows=1_000) -> dict:
    from mobility_etl_spark.operators.snapshots import (
        _cat_versions,
        _list_versions,
        snapshot_tip,
    )
    from mobility_etl_spark.streaming import jobs

    base = tempfile.mkdtemp(prefix="soak12-")
    root = os.path.join(base, "root")
    d = 64
    total = n_batches * batch_rows
    vecs, _ = _zipf_mixture(total, d=d, k=16)
    texts = [
        " ".join(
            f"w{(i * 131 + j * 17) % 997}" for j in range(60 + i % 40)
        )
        for i in range(total)
    ]
    emb_all = spark.createDataFrame(
        [
            (i, [float(x) for x in vecs[i]])
            for i in range(total)
        ],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)
    jobs.pretraining_stream_init(
        spark, root, emb_all.limit(2048), n_cells=16
    )
    out: dict = {"batches": []}
    checkpoints = {1, 25, 50, 100}
    compact_every = 24
    for b in range(n_batches):
        lo, hi = b * batch_rows, (b + 1) * batch_rows
        batch = spark.createDataFrame(
            [(i, texts[i], "en") for i in range(lo, hi)],
            "doc_id long, text string, lang string",
        )
        t0 = time.perf_counter()
        jobs.pretraining_apply_batch(
            spark, batch, b, root, emb_all, 0.92
        )
        # maintenance cadence, as in pretraining_stream_ingest
        from mobility_etl_spark.operators.snapshots import (
            commit_catalog,
            compact_snapshot,
        )

        has_cents = jobs._load_centroids(root) is not None
        compacted = False
        for name in jobs._PRETRAIN_TABLES:
            path = os.path.join(root, name)
            budget = compact_every + (
                jobs._EMBINDEX_FILES
                if name == "embindex" and has_cents
                else 0
            )
            if snapshot_tip(path)["n_files"] > budget:
                if name == "embindex" and has_cents:
                    compact_snapshot(
                        spark,
                        path,
                        layout_col="cell",
                        layout_files=jobs._EMBINDEX_FILES,
                        layout_secondary=("ccos",),
                        max_file_rows=jobs._EMBINDEX_MAX_FILE_ROWS,
                        stats_cols=jobs._EMBINDEX_STATS,
                    )
                else:
                    compact_snapshot(spark, path)
                compacted = True
        if compacted:
            commit_catalog(
                root,
                {
                    name: (
                        os.path.join(root, name),
                        _list_versions(os.path.join(root, name))[-1],
                    )
                    for name in jobs._PRETRAIN_TABLES
                },
                note=f"maint-{b}",
            )
            # retention GC, exactly as pretraining_stream_ingest runs
            # it — without this the manifest chain grows O(batches)
            from mobility_etl_spark.operators.snapshots import (
                catalog_vacuum,
            )

            catalog_vacuum(root, keep_last=2)
        wall = time.perf_counter() - t0
        out.setdefault("walls_s", []).append(round(wall, 3))
        if (b + 1) in checkpoints:
            tips = {
                name: snapshot_tip(os.path.join(root, name))["n_files"]
                for name in jobs._PRETRAIN_TABLES
            }
            manifests = sum(
                len(_list_versions(os.path.join(root, name)))
                for name in jobs._PRETRAIN_TABLES
            )
            out["batches"].append(
                {
                    "batch": b + 1,
                    "wall_s": round(wall, 3),
                    "tip_files": tips,
                    "manifests": manifests,
                    "catalog_versions": len(_cat_versions(root)),
                    "rss_mb": round(_rss_mb(), 1),
                }
            )
            print(json.dumps(out["batches"][-1]), flush=True)
    # VERDICT r13 #4: the number a long-lived cluster actually pays —
    # median per-batch wall over the steady-state tail (batches 25..N),
    # after compaction cadence and index growth have reached regime.
    # bench_pipeline.py publishes this into BENCH_PIPELINE.json.
    tail = sorted(out["walls_s"][24:]) or sorted(out["walls_s"])
    mid = len(tail) // 2
    out["steady_state_per_batch"] = round(
        tail[mid]
        if len(tail) % 2
        else (tail[mid - 1] + tail[mid]) / 2.0,
        3,
    )
    out["steady_state_params"] = {
        "n_batches": n_batches,
        "batch_rows": batch_rows,
        "tail_from_batch": 25,
    }
    shutil.rmtree(base, ignore_errors=True)
    return out


def main():
    from mobility_etl_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(
        "bench-stress-r12", master="local[16]", shuffle_partitions=16
    )
    doc: dict = {}
    if which in ("skew", "all"):
        doc["skew"] = skew_join_stress(spark)
        print(json.dumps({"skew": doc["skew"]}, indent=1), flush=True)
    if which in ("probe", "all"):
        doc["probe"] = probe_curve_1e6(spark)
        print(json.dumps({"probe": doc["probe"]}, indent=1), flush=True)
    if which in ("soak", "all"):
        doc["soak"] = capstone_soak(spark)
        # persisted so bench_pipeline.py can publish the steady-state
        # number without re-running the 100-batch soak every bench pass
        with open("SOAK_LATEST.json", "w") as fh:
            json.dump(doc["soak"], fh, indent=1, sort_keys=True)
    print("FINAL " + json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
