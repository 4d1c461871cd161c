"""Round-11 scale-stress measurements (VERDICT r10 #1/#5): the pruned
semantic probe PAST the control-plane floor that hid the linear term
at 2k vectors —

1. PROBE CURVE: exact_probe_blas (full scan) vs
   exact_probe_blas_pruned (per-query-cell manifest pruning) for a
   1k-row increment against stored cell-clustered indexes of 10k ..
   100k CLUSTERABLE vectors (tight 64-component mixture — real
   document-embedding geometry). The claim the pruning buys: pruned
   per-probe cost grows with REACHABLE pairs, not index size; the
   full scan's grows linearly. Reports wall clock + the
   (query, file)-pair skip fraction per point.
2. ISOTROPY AUDIT of the synthetic sf embeddings: pairwise-cosine
   quantiles + the best-case exact-prune bound, documenting WHY no
   exactness-preserving method can skip on that table at tau = 0.47
   (SCALING.md r11 carries the numbers).
3. CAPSTONE PER-BATCH CURVE: pretraining_apply_batch over 20
   micro-batches of 1k docs (20k-vector final index, 10x the r10
   floor) on a clusterable corpus, pruned vs pruning-less fallback.

Prints a JSON document; paste the summary rows into SCALING.md.

    PYTHONPATH=. python tools/bench_stress_r11.py
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F


def _clusterable(n, d=64, k=64, spread=0.02, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, k, size=n)
    v = (centers[assign] + spread * rng.randn(n, d)).astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _vec_df(spark, vecs, key="doc_id", base=0):
    return spark.createDataFrame(
        [(base + i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        f"{key} long, embedding array<float>",
    )


def probe_curve(spark, sizes=(10_000, 25_000, 50_000, 100_000)) -> dict:
    from mobility_etl_spark.operators import similarity as sim
    from mobility_etl_spark.operators.snapshots import (
        _list_versions,
        append_snapshot,
        commit_snapshot,
    )

    tau, n_cells, files = 0.6, 64, 64
    out = {"tau": tau, "n_cells": n_cells, "points": []}
    vecs = _clusterable(max(sizes))
    # a DIVERSE increment (first 1k rows — touches ~every component:
    # the worst case for file-level pruning, the realistic stream
    # batch) and a CLUSTER-LOCAL one (4 components — the hot-spot
    # case where whole-file I/O skipping shows)
    inc = _vec_df(spark, vecs[:1000], base=10_000_000)
    cents = sim.train_kmeans_centroids(
        _vec_df(spark, vecs[:4096], key="vec_id"),
        n_cells=n_cells,
        sample_n=4096,
    )
    local_cells = np.argmax(vecs @ cents.T, axis=1)
    local_idx = np.nonzero(np.isin(local_cells, (1, 5, 9, 13)))[0][:1000]
    inc_local = _vec_df(spark, vecs[local_idx], base=20_000_000)
    for n in sizes:
        root = tempfile.mkdtemp(prefix=f"probecurve_{n}_")
        path = os.path.join(root, "embindex")
        spark.createDataFrame(
            [],
            "doc_id long, embedding array<float>, cell int, ccos double",
        ).coalesce(1).write.parquet(path)
        commit_snapshot(
            spark, path, note="init", stats_cols=("cell", "ccos")
        )
        tagged = sim.assign_cells(_vec_df(spark, vecs[:n]), cents)
        append_snapshot(
            spark,
            path,
            tagged.repartitionByRange(files, "cell").sortWithinPartitions(
                "cell"
            ),
            note="e0",
            stats_cols=("cell", "ccos", "doc_id"),
        )
        v = _list_versions(path)[-1]
        corpus = spark.read.parquet(path).select("doc_id", "embedding")

        t0 = time.monotonic()
        n_full = sim.exact_probe_blas(inc, corpus, tau).count()
        t_full = time.monotonic() - t0

        sim.PROBE_PRUNE_STATS.update(
            files_total=0, files_kept=0, qf_total=0, qf_kept=0
        )
        t0 = time.monotonic()
        n_pruned = sim.exact_probe_blas_pruned(
            spark, inc, path, v, cents, tau
        ).count()
        t_pruned = time.monotonic() - t0
        st = dict(sim.PROBE_PRUNE_STATS)
        assert n_full == n_pruned, (n, n_full, n_pruned)

        sim.PROBE_PRUNE_STATS.update(
            files_total=0, files_kept=0, qf_total=0, qf_kept=0
        )
        t0 = time.monotonic()
        sim.exact_probe_blas_pruned(
            spark, inc_local, path, v, cents, tau
        ).count()
        t_local = time.monotonic() - t0
        st_l = dict(sim.PROBE_PRUNE_STATS)
        out["points"].append(
            {
                "index_rows": n,
                "hits": n_full,
                "t_full_s": round(t_full, 3),
                "t_pruned_s": round(t_pruned, 3),
                "file_skip": round(
                    1 - st["files_kept"] / st["files_total"], 3
                ),
                "qf_skip": round(1 - st["qf_kept"] / st["qf_total"], 3),
                "t_pruned_local_s": round(t_local, 3),
                "file_skip_local": round(
                    1 - st_l["files_kept"] / st_l["files_total"], 3
                ),
                "qf_skip_local": round(
                    1 - st_l["qf_kept"] / st_l["qf_total"], 3
                ),
            }
        )
        shutil.rmtree(root, ignore_errors=True)
    return out


def isotropy_audit(sf_dir="/root/testdata/sf0.1", tau=0.47) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    v = np.stack(
        [
            np.asarray(x, dtype=np.float64)
            for x in t.column("embedding").to_pylist()
        ]
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    s = v @ v.T
    iu = np.triu_indices(len(v), 1)
    sims = s[iu]
    batch = v[-500:]  # a representative micro-batch
    true_max = (v @ batch.T).max(axis=1)
    return {
        "sf": sf_dir,
        "n": len(v),
        "pair_sim_quantiles": {
            q: round(float(np.quantile(sims, q)), 4)
            for q in (0.5, 0.9, 0.99, 0.999, 1.0)
        },
        "pairs_ge_tau": int((sims >= tau).sum()),
        # the IDEAL exact pruner can only skip rows whose TRUE max
        # similarity to the batch is < tau; any real bound sits above
        "oracle_skippable_frac_b500": round(
            float((true_max < tau).mean()), 4
        ),
    }


def capstone_batches(spark, n_batches=20, batch=1_000) -> dict:
    from mobility_etl_spark.streaming.jobs import (
        pretraining_apply_batch,
        pretraining_stream_init,
    )

    total = n_batches * batch
    vecs = _clusterable(total, seed=9)
    emb = _vec_df(spark, vecs, key="vec_id")
    rng = np.random.RandomState(3)
    words = [f"w{i}" for i in range(500)]
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(words[j] for j in rng.randint(0, 500, size=60)),
                ("en", "de", "fr")[i % 3],
            )
            for i in range(total)
        ],
        "doc_id long, text string, lang string",
    ).cache()
    docs.count()
    out = {"batch": batch, "modes": {}}
    from mobility_etl_spark.operators.snapshots import (
        compact_snapshot,
        snapshot_log,
    )
    from mobility_etl_spark.streaming.jobs import (
        _EMBINDEX_FILES,
        _EMBINDEX_STATS,
        _PRETRAIN_TABLES,
    )

    for mode in ("pruned", "full"):
        root = tempfile.mkdtemp(prefix=f"capstress_{mode}_")
        pretraining_stream_init(
            spark, root, emb=emb if mode == "pruned" else None, n_cells=64
        )
        times = []
        for e in range(n_batches):
            b = docs.filter(
                (F.col("doc_id") >= e * batch)
                & (F.col("doc_id") < (e + 1) * batch)
            )
            t0 = time.monotonic()
            pretraining_apply_batch(spark, b, e, root, emb, 0.6)
            # the stream's maintenance budget (compact_every=8), so
            # per-batch cost measures the steady state, not raw
            # file-count growth
            for name in _PRETRAIN_TABLES:
                path = os.path.join(root, name)
                budget = 8 + (
                    _EMBINDEX_FILES
                    if name == "embindex" and mode == "pruned"
                    else 0
                )
                if snapshot_log(path)[-1]["n_files"] > budget:
                    if name == "embindex" and mode == "pruned":
                        compact_snapshot(
                            spark,
                            path,
                            layout_col="cell",
                            layout_files=_EMBINDEX_FILES,
                            stats_cols=_EMBINDEX_STATS,
                        )
                    else:
                        compact_snapshot(spark, path)
            times.append(round(time.monotonic() - t0, 2))
        out["modes"][mode] = {
            "per_batch_s": times,
            "first5_avg": round(sum(times[:5]) / 5, 2),
            "last5_avg": round(sum(times[-5:]) / 5, 2),
        }
        shutil.rmtree(root, ignore_errors=True)
    docs.unpersist()
    return out


def main() -> None:
    from mobility_etl_spark.session import get_spark

    spark = get_spark(
        "stress-r11", master="local[16]", shuffle_partitions=16
    )
    doc = {
        "isotropy_sf01": isotropy_audit(),
        "probe_curve": probe_curve(spark),
        "capstone_batches": capstone_batches(spark),
    }
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
