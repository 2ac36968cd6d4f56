#!/usr/bin/env python
"""Synthesize a larger benchmark scale from the driver testdata by
SIMILARITY-PRESERVING replication (VERDICT r2 next #5: the sf0.1 headline
medians are sub-second, so constant overheads dominate; scale-sensitive
effects — minhash candidate volume, threshold boundary slices, CC rounds —
need a bigger sf).

Replication must not change the WORKLOAD SHAPE, only its size:

- ``documents``: every whitespace token gets a per-replica suffix. The map
  word → word+tag is injective, so shingle sets map injectively: within a
  replica every planted near-dup pair keeps its EXACT jaccard; across
  replicas shingle overlap is zero. Near-dup pair count therefore scales
  exactly linearly (naive duplication would instead create quadratic
  cross-copy near-dup cliques and a different workload).
- ``embeddings``: each replica is rotated by a seeded random ORTHOGONAL
  matrix — inner products (hence all cosines) within a replica are exactly
  preserved; cross-replica cosines scatter to ~N(0, 1/√d), far below the
  0.95 thresholds. Pair counts again scale linearly.
- ``lineitem``/``orders``: keys offset by replica stride (join consistency
  preserved; the downsample key arithmetic l_orderkey*KNUTH stays inside
  int64 for strides < ~3e9).
- ``events``: event_id/user_id offset; timestamps unchanged, so per-bucket
  densities (rollup group counts) scale 10x while bucket counts stay fixed
  — the shape a 10x-bigger day of the same service would have.
- dims (region/nation/customer/supplier/part) copied unchanged.

Usage: python scripts/make_sf.py [--factor 10] [--out /root/repo/.bench_sf1]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def replicate_documents(con, out, factor):
    base = con.execute(f"SELECT * FROM '{SRC}/documents.parquet'").df()
    parts = [base]
    for k in range(1, factor):
        rep = base.copy()
        rep["doc_id"] = rep["doc_id"] + k * STRIDE
        tag = f"q{k}"
        rep["text"] = rep["text"].map(
            lambda t, tag=tag: re.sub(r"(\S+)", lambda m: m.group(1) + tag, t)
        )
        rep["n_chars"] = rep["text"].str.len().astype(base["n_chars"].dtype)
        parts.append(rep)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{out}/documents.parquet", index=False
    )


def replicate_embeddings(out, factor):
    base = pd.read_parquet(f"{SRC}/embeddings.parquet")
    mat = np.vstack(base["embedding"].to_numpy()).astype(np.float64)
    dim = mat.shape[1]
    parts = [base]
    for k in range(1, factor):
        rng = np.random.RandomState(1000 + k)
        q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
        rot = (mat @ q).astype(np.float32)
        rep = pd.DataFrame(
            {
                "vec_id": base["vec_id"] + k * STRIDE,
                "embedding": list(rot),
                "label": base["label"],
            }
        )
        parts.append(rep)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{out}/embeddings.parquet", index=False
    )


def replicate_keyed(con, out, table, key_cols, factor):
    sel = ", ".join(
        f"{c} + {{off}} AS {c}" if c in key_cols else c
        for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
        ).df()["column_name"]
    )
    union = " UNION ALL ".join(
        f"SELECT {sel.format(off=k * STRIDE)} FROM '{SRC}/{table}.parquet'"
        for k in range(factor)
    )
    con.execute(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.bench_sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{args.out}/{t}.parquet")
    replicate_keyed(con, args.out, "lineitem", {"l_orderkey"}, args.factor)
    replicate_keyed(con, args.out, "orders", {"o_orderkey"}, args.factor)
    replicate_keyed(con, args.out, "events", {"event_id", "user_id"}, args.factor)
    replicate_documents(con, args.out, args.factor)
    replicate_embeddings(args.out, args.factor)
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
