#!/usr/bin/env python
"""Round-7 measurement probe: decompose semantic_dedup wall time at a given
scale dir (guide §1 — measure first, noop sink, labeled jobs). Not part of
bench.py (frozen); numbers land in OPTIMIZATION_r07.md."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rasusa_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("probe_semdedup", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    from rasusa_spark.operators.similarity import (
        _dot, _norm, ivf_assign, ivf_build_centroids)
    from rasusa_spark.operators.dedup import dedup_clusters, _DEDUP_CACHES

    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = {"sf_dir": sf_dir}

    t0 = time.perf_counter()
    cents = ivf_build_centroids(embs, n_cells=8, sample=512, iters=8, seed=7)
    out["train_s"] = round(time.perf_counter() - t0, 3)

    spark.sparkContext.setJobDescription("semdedup: assign+persist")
    t0 = time.perf_counter()
    asg = (ivf_assign(embs, cents).select("vec_id", "embedding", "ivf_cell")
           .persist())
    n = asg.count()
    out["assign_s"] = round(time.perf_counter() - t0, 3)
    out["n_rows"] = n

    spark.sparkContext.setJobDescription("semdedup: cell histogram")
    hist = {r["ivf_cell"]: r["cnt"] for r in
            asg.groupBy("ivf_cell").agg(F.count("*").alias("cnt")).collect()}
    out["cell_hist"] = hist
    out["pair_volume"] = sum(c * (c - 1) // 2 for c in hist.values())

    a = F.col("a.embedding")
    b = F.col("b.embedding")
    pairs = (
        asg.alias("a").join(asg.alias("b"), on="ivf_cell")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6).alias("cosine"))
        .where(F.col("cosine") >= 0.4)
        .select("id_a", "id_b"))

    spark.sparkContext.setJobDescription("semdedup: pairs noop")
    t0 = time.perf_counter()
    pairs.write.format("noop").mode("overwrite").save()
    out["pairs_s"] = round(time.perf_counter() - t0, 3)

    spark.sparkContext.setJobDescription("semdedup: pairs persist+count")
    t0 = time.perf_counter()
    p = pairs.persist()
    out["n_pairs"] = p.count()
    out["pairs_persist_s"] = round(time.perf_counter() - t0, 3)

    spark.sparkContext.setJobDescription("semdedup: CC closure from persisted pairs")
    t0 = time.perf_counter()
    dedup_clusters(embs, p, id_col="vec_id").write.format("noop").mode(
        "overwrite").save()
    out["cc_s"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
