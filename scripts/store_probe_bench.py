#!/usr/bin/env python
"""Incremental-store probe latency vs increment count (VERDICT r5 Next #7).

Builds the O(delta) IVF store with 20 small increments of synthetic
embeddings, measuring `ivf_store_topk` latency as txn directories (and
with them small files) accumulate, then runs `compact_ivf_cells` and
measures again — the evidence that (a) probe cost grows with increment
count in the un-compacted store and (b) compaction restores it. Also runs
the dedup store through 20 tiny increments and records per-increment merge
wall (flat-ish: each merge's candidate work is O(delta), with the stored
side shard-pruned).

Writes ONE json to BENCH/store_probe_scale.json:
  {"ivf": {"probe_ms_at": {"1": .., "5": .., "10": .., "20": ..},
           "probe_ms_compacted": .., "files_at_20": .., "files_compacted": ..,
           "folded_txns": ..},
   "dedup": {"merge_s_first5_median": .., "merge_s_last5_median": ..,
             "bands_sigs_files_at_20": .., "files_compacted": ..}}

Timing protocol: median of 5 probes inside one warmed JVM (this VM's
run-to-run noise is ±15-30%).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/store_probe_bench"
N_INC = 20
VEC_PER_INC = 2000
DIM = 32
DOCS_PER_INC = 40


def main() -> None:
    from pyspark.sql import functions as F

    import rasusa_spark.streaming.ann_inc as ann
    import rasusa_spark.streaming.dedup_inc as dd
    from rasusa_spark.session import get_spark

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    spark = get_spark("store_probe_bench", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # --- IVF: 20 increments of deterministic synthetic embeddings -------
    rng = np.random.default_rng(7)
    state = f"{WORK}/ivf_state"
    q = [float(x) for x in rng.normal(size=DIM)]

    def probe_ms(reps: int = 5) -> float:
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            ann.ivf_store_topk(spark, state, q, k=10, nprobe=4).collect()
            walls.append((time.perf_counter() - t0) * 1000)
        return float(np.median(walls))

    probe_at: dict[str, float] = {}
    for k in range(N_INC):
        vecs = rng.normal(size=(VEC_PER_INC, DIM))
        rows = [
            (int(k * VEC_PER_INC + i), [float(x) for x in vecs[i]])
            for i in range(VEC_PER_INC)
        ]
        path = f"{WORK}/emb/{k}"
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.parquet(path)
        files = sorted(glob.glob(f"{path}/*.parquet"))
        ann.merge_ivf_increment(
            spark, spark.read.parquet(*files), state, files=files,
            n_cells=16, sample=2048, iters=8, seed=7,
        )
        if k + 1 in (1, 5, 10, 20):
            probe_at[str(k + 1)] = round(probe_ms(), 2)

    cells_glob = f"{state}/ivf_store/cells/txn=*/ivf_cell=*/*.parquet"
    files_at_20 = len(glob.glob(cells_glob))
    stats = ann.compact_ivf_cells(spark, state)
    probe_compacted = round(probe_ms(), 2)

    # --- dedup: 20 tiny increments, merge wall per increment ------------
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    dstate = f"{WORK}/dedup_state"
    merge_walls = []
    for k in range(N_INC):
        lo = ids[k * len(ids) // N_INC]
        hi = ids[min(len(ids), (k + 1) * len(ids) // N_INC) - 1]
        sl = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
        path = f"{WORK}/docs/{k}"
        sl.coalesce(1).write.parquet(path)
        files = sorted(glob.glob(f"{path}/*.parquet"))
        t0 = time.perf_counter()
        dd.merge_minhash_increment(
            spark, spark.read.parquet(*files), state_path=dstate, files=files
        )
        merge_walls.append(time.perf_counter() - t0)
    bands_glob = f"{dstate}/minhash_store/bands/txn=*/shard=*/*.parquet"
    sigs_glob = f"{dstate}/minhash_store/sigs/txn=*/sig_shard=*/*.parquet"
    dfiles_at_20 = len(glob.glob(bands_glob)) + len(glob.glob(sigs_glob))
    dstats = dd.compact_minhash_store(spark, dstate)

    out = {
        "ivf": {
            "probe_ms_at": probe_at,
            "probe_ms_compacted": probe_compacted,
            "files_at_20": files_at_20,
            "files_compacted": stats["files_after"],
            "folded_txns": stats["folded_txns"],
            "n_vectors": N_INC * VEC_PER_INC,
        },
        "dedup": {
            "merge_s_first5_median": round(float(np.median(merge_walls[:5])), 3),
            "merge_s_last5_median": round(float(np.median(merge_walls[-5:])), 3),
            "bands_sigs_files_at_20": dfiles_at_20,
            "files_compacted": dstats["files_after"],
            "folded_txns": dstats["folded_txns"],
        },
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "store_probe_scale.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
