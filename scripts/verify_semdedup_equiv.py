#!/usr/bin/env python
"""Round-7 equivalence proof: the GEMM-based semantic_dedup pair stage
produces the IDENTICAL edge set and final clustering as the former
per-pair JVM-fold self-join, per scale dir. Run per sf dir:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/verify_semdedup_equiv.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rasusa_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("verify_semdedup", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    from rasusa_spark.operators.similarity import (
        _dot, _norm, ivf_assign, ivf_build_centroids, semantic_dedup)

    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = {"sf_dir": sf_dir}

    # zero-norm vectors would hit NaN-comparison semantics differences
    n_zero = embs.where(
        _dot(F.col("embedding"), F.col("embedding")) == 0.0
    ).count()
    out["n_zero_norm"] = n_zero

    cents = ivf_build_centroids(embs, n_cells=8, sample=512, iters=8, seed=7)
    asg = (ivf_assign(embs, cents).select("vec_id", "embedding", "ivf_cell")
           .persist())
    a = F.col("a.embedding")
    b = F.col("b.embedding")
    old_pairs = (
        asg.alias("a").join(asg.alias("b"), on="ivf_cell")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6).alias("cosine"))
        .where(F.col("cosine") >= 0.4)
        .select("id_a", "id_b"))
    old_set = {(r.id_a, r.id_b) for r in old_pairs.collect()}

    # new pair stage: re-derive via the public operator's internals by
    # running the full operator and ALSO compare final clustering below
    new_out = semantic_dedup(embs, threshold=0.4, n_cells=8, sample=512)
    # rebuild just the pair stage the same way semantic_dedup now does
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    pair_schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )
    cut = float(np.floor(0.4 * 1e6 + 0.5))

    def cell_pairs(pdf):
        pdf = pdf.sort_values("_id", kind="mergesort").reset_index(drop=True)
        ids = pdf["_id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        mat = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        block = max(256, (1 << 25) // max(m, 1))
        out_a, out_b = [], []
        for i0 in range(0, m, block):
            i1 = min(i0 + block, m)
            g = mat[i0:i1] @ mat.T
            cos = g / (norms[i0:i1, None] * norms[None, :])
            scaled = np.floor(cos * 1e6 + 0.5)
            ri, ci = np.nonzero(scaled >= cut)
            keep = ci > (ri + i0)
            out_a.append(ids[ri[keep] + i0])
            out_b.append(ids[ci[keep]])
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    new_pairs = (
        asg.select(F.col("vec_id").alias("_id"),
                   F.col("embedding").alias("_v"), "ivf_cell")
        .groupBy("ivf_cell").applyInPandas(cell_pairs, pair_schema)
    )
    new_set = {(r.id_a, r.id_b) for r in new_pairs.collect()}

    out["n_pairs_old"] = len(old_set)
    out["n_pairs_new"] = len(new_set)
    out["pairs_equal"] = old_set == new_set
    if old_set != new_set:
        out["only_old"] = sorted(old_set - new_set)[:20]
        out["only_new"] = sorted(new_set - old_set)[:20]

    # final clustering from the old pair set vs the shipped operator
    from rasusa_spark.operators.dedup import dedup_clusters
    old_clusters = {
        (r.vec_id, r.cluster_id)
        for r in dedup_clusters(embs, old_pairs, id_col="vec_id").collect()
    }
    new_clusters = {(r.vec_id, r.cluster_id) for r in new_out.collect()}
    out["clusters_equal"] = old_clusters == new_clusters
    out["n_rows"] = len(new_clusters)

    print(json.dumps(out))
    spark.stop()
    if not (out["pairs_equal"] and out["clusters_equal"] and n_zero == 0):
        sys.exit(1)


if __name__ == "__main__":
    main()
