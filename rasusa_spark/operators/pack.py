"""Training-batch assembly operators: sequence packing and deterministic
dataset splits.

Sequence packing is the canonical last step of a token pipeline — documents
are concatenated into fixed-capacity training sequences (e.g. 2048/8192
tokens) so no GPU batch slot is wasted on padding. The reference engine
stops at per-read selection (rasusa has no batching analog); this is a
new-capability operator alongside dedup/similarity (SURVEY §2.12).

``split_assign`` is the deterministic train/val/test partitioner every
pipeline needs: membership is a pure function of (seed, id) via a portable
md5 bucket, never of partition layout, so it is reproducible across engines
(the DuckDB oracle computes the identical bucket) and across cluster sizes.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_pack_ids(lens: np.ndarray, capacity: int) -> np.ndarray:
    """Vectorized-per-pack greedy first-fit-contiguous assignment: returns
    the pack ordinal for each length, in order. Loops over PACKS (one
    ``searchsorted`` on the cumsum per boundary), not rows."""
    lens = np.asarray(lens, dtype=np.int64)
    cs = np.cumsum(lens)
    n = len(lens)
    pack_ids = np.empty(n, dtype=np.int64)
    i, base, pid = 0, 0, 0
    while i < n:
        j = int(np.searchsorted(cs, base + capacity, side="right"))
        if j <= i:  # oversize doc: own pack
            j = i + 1
        pack_ids[i:j] = pid
        base = int(cs[j - 1])
        pid += 1
        i = j
    return pack_ids


def pack_sequences(
    df: DataFrame,
    capacity: int,
    group_cols: Iterable[str] = ("source",),
    order_col: str = "doc_id",
    len_col: str = "n_tok",
) -> DataFrame:
    """Greedy contiguous first-fit packing: within each group, documents in
    ``order_col`` order are appended to the current pack; a pack closes when
    the next document would push its fill past ``capacity``; a document
    longer than ``capacity`` occupies a pack of its own. Adds ``pack_id``
    (per-group ordinal from 0) and ``pack_fill`` (running fill after the
    doc) to the input columns.

    Scale shape: packing is order-dependent *within a group* by definition,
    so the unit of parallelism is the group — pass fine-grained
    ``group_cols`` (e.g. (source, day)) at scale and groups pack
    independently, one shuffle total. The per-group kernel is Arrow-batched
    and loops over PACKS, not rows: each boundary is one
    ``np.searchsorted`` on the cumulative-sum array, so a group with R rows
    and P packs costs O(R + P log R).
    """
    group_cols = list(group_cols)
    out_schema = df.select(
        *group_cols, order_col, len_col
    ).schema.add("pack_id", "long").add("pack_fill", "long")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        lens = pdf[len_col].to_numpy(dtype=np.int64)
        cs = np.cumsum(lens)
        n = len(lens)
        pack_ids = greedy_pack_ids(lens, capacity)
        pdf["pack_id"] = pack_ids
        # pack_fill = cumulative sum within the pack, vectorized: subtract
        # each pack's starting offset (cs just before its first row)
        starts = np.flatnonzero(np.diff(pack_ids, prepend=-1))
        base_per_pack = np.where(starts > 0, cs[starts - 1], 0)
        pack_start_cs = np.repeat(base_per_pack, np.diff(np.append(starts, n)))
        pdf["pack_fill"] = cs - pack_start_cs
        return pdf[[*group_cols, order_col, len_col, "pack_id", "pack_fill"]]

    return (
        df.select(*group_cols, order_col, len_col)
        .groupBy(*group_cols)
        .applyInPandas(_pack, out_schema)
    )


def pack_summary(packed: DataFrame, group_cols: Iterable[str] = ("source",)) -> DataFrame:
    """Per-pack utilization: (group, pack_id, n_docs, fill)."""
    group_cols = list(group_cols)
    return packed.groupBy(*group_cols, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.max("pack_fill").alias("fill")
    )


def split_assign(
    df: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
    weights: Mapping[str, float] | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic, engine-portable train/val/test assignment: bucket =
    first 8 hex digits of md5(seed || ':' || id) mod ``buckets``, mapped to
    splits by cumulative weight. A pure projection (no shuffle, no Python);
    membership depends only on (seed, id) — re-partitioning, re-ordering,
    or re-running on a different cluster size cannot move a row between
    splits, which is the property that keeps eval sets stable across
    pipeline re-runs."""
    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % buckets
    )
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
