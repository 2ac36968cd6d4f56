"""Custom stateful streaming operator: per-(source, bucket) budget
downsampling over an unbounded stream via ``applyInPandasWithState``.

The batch engine selects a random prefix of a key-ordered permutation
(operators/downsample.py); the streaming form is the reference's one-pass
posture (fastx.rs:124-126: single pass, constant memory, decide-as-you-go)
applied to ByBases semantics: rows are decided in ARRIVAL order, each group
carries ``(kept_rows, kept_tokens)`` state across micro-batches, and a row
is kept while the group's cumulative kept tokens are still below the
budget — the crossing row is kept (subsampler.rs:83-91), everything after
it in the stream is dropped. State is a two-long struct per open bucket —
bounded by the number of open buckets, not by rows (the engine analog of
rasusa's constant-memory guarantee).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("kept_rows", T.LongType()),
        T.StructField("kept_tokens", T.LongType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("bucket_start", T.TimestampType()),
    ]
)


def _budget_fn(budget: int):
    def decide(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        kept_rows, kept_tokens = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if kept_tokens >= budget or pdf.empty:
                continue
            toks = pdf["n_tok"].to_numpy(dtype="int64")
            # Exclusive prefix sum of tokens, offset by carried state: a row
            # is kept while the group's tokens BEFORE it are under budget
            # (crossing row kept, subsampler.rs:83-91). n_tok >= 0, so the
            # prefix is nondecreasing and searchsorted finds the first row
            # whose pre-row total already meets the budget.
            prev = kept_tokens + np.cumsum(toks) - toks
            n_keep = int(np.searchsorted(prev, budget, side="left"))
            if n_keep:
                kept_tokens += int(toks[:n_keep].sum())
                kept_rows += n_keep
                yield pdf.iloc[:n_keep]
        state.update((kept_rows, kept_tokens))

    return decide


def streaming_budget_downsample(
    spark,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    schema: T.StructType,
    budget: int,
    bucket_unit: str = "day",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """File-source stream → per-(source, bucket) stateful budget cap →
    parquet sink. Returns the StreamingQuery."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_path).withColumn(
        "bucket_start", F.date_trunc(bucket_unit, F.col("ts"))
    )
    decided = (
        stream.select("doc_id", "n_tok", "source", "ts", "bucket_start")
        .groupBy("source", "bucket_start")
        .applyInPandasWithState(
            _budget_fn(budget),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        decided.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_equivalent_budget(
    df: DataFrame, budget: int, bucket_unit: str = "day"
) -> DataFrame:
    """Arrival-order batch reference for the streaming operator (same
    semantics, single batch): keep while the running sum over row order is
    below the budget."""
    from pyspark.sql import Window

    b = df.withColumn("bucket_start", F.date_trunc(bucket_unit, F.col("ts")))
    w = (
        Window.partitionBy("source", "bucket_start")
        .orderBy("row_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(F.col("n_tok").cast("long")).over(w), F.lit(0))
    return (
        b.withColumn("_prev", prev)
        .where(F.col("_prev") < budget)
        .drop("_prev")
    )


# ---------------------------------------------------------------------------
# stateful streaming counter rate (round 4)
# ---------------------------------------------------------------------------

COUNTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_xu", T.LongType()),
        T.StructField("last_id", T.LongType()),
        T.StructField("last_val", T.LongType()),
    ]
)

COUNTER_OUT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("inc", T.LongType()),
        T.StructField("is_reset", T.IntegerType()),
    ]
)


def _counter_fn():
    """Per-series reset-aware delta kernel with the last sample carried as
    state — the streaming twin of operators/timeseries.counter_increase
    (same pinned contract: (ts, id) order, decrease counts its full value,
    very first sample of a series contributes 0). Vectorized: one sort +
    one shift per micro-batch, zero per-row Python.

    Assumes per-series in-order arrival ACROSS micro-batches (scrape/
    append order — the Prometheus ingestion posture); within a batch any
    order is fine (sorted here). An out-of-order sample older than the
    carried state would mis-derive its delta — the batch operator is the
    tool for unordered backfills."""

    def derive(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_xu, last_id, last_val = (
            state.get if state.exists else (None, None, None)
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            xu = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            ids = pdf["event_id"].to_numpy(dtype="int64")
            order = np.lexsort((ids, xu))
            pdf = pdf.iloc[order]
            v = pdf["n_tok"].to_numpy(dtype="int64")
            prev = np.roll(v, 1)
            if last_val is None:
                first_contrib = 0
                first_reset = 0
            else:
                first_contrib = int(v[0]) if v[0] < last_val else int(v[0] - last_val)
                first_reset = 1 if v[0] < last_val else 0
            inc = np.where(v < prev, v, v - prev)
            rst = (v < prev).astype("int32")
            inc[0] = first_contrib
            rst[0] = first_reset
            last_xu = int(xu[order][-1])
            last_id = int(ids[order][-1])
            last_val = int(v[-1])
            yield pd.DataFrame(
                {
                    "series": key[0],
                    "ts": pdf["ts"].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "inc": inc,
                    "is_reset": rst,
                }
            )
        if last_val is not None:
            state.update((last_xu, last_id, last_val))

    return derive


def streaming_counter_increase(
    spark,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    schema: T.StructType,
    series_col: str = "event_type",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """File-source stream → per-series stateful reset-aware deltas →
    parquet sink of per-sample increases (bucket them downstream with
    time_bucket/rollup — contributions are integer-exact, so any later
    aggregation is associative). State per series is ONE (ts, id, value)
    triple — bounded by series cardinality, the Prometheus-counter memory
    posture."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_path)
    out = (
        stream.select(
            F.col(series_col).alias("series"), "ts", "event_id", "n_tok"
        )
        .groupBy("series")
        .applyInPandasWithState(
            _counter_fn(),
            COUNTER_OUT_SCHEMA,
            COUNTER_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


TWA_STATE_SCHEMA = COUNTER_STATE_SCHEMA  # same (last_xu, last_id, last_val)

TWA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("val", T.LongType()),
        # segment COMPLETED by this sample's arrival: prev value held for
        # (this_xu - prev_xu) micros, assigned to the PREDECESSOR's bucket
        # (batch twa integrates within-bucket pairs only; cross-bucket
        # pairs contribute nothing there, so seg_bucket != own bucket rows
        # carry seg = 0 and exist only for the sample itself)
        T.StructField("seg_bucket_xu", T.LongType()),
        T.StructField("seg", T.LongType()),
        T.StructField("gap", T.LongType()),
    ]
)


def _twa_fn(width_us: int, origin_us: int):
    """Streaming twin of operators/timeseries.time_weighted_avg: per
    series carry the last (ts, id, value); each arriving sample completes
    the segment ``prev_val * (xu - prev_xu)`` and emits it against the
    predecessor's bucket IF both samples share that bucket (the batch
    LOCF integral runs first→last sample WITHIN a bucket — cross-bucket
    pairs contribute nothing). Vectorized per micro-batch."""

    def derive(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_xu, last_id, last_val = (
            state.get if state.exists else (None, None, None)
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            xu0 = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            ids0 = pdf["event_id"].to_numpy(dtype="int64")
            order = np.lexsort((ids0, xu0))
            pdf = pdf.iloc[order]
            xu = xu0[order]
            v = pdf["n_tok"].to_numpy(dtype="int64")
            bk = origin_us + ((xu - origin_us) // width_us) * width_us
            # predecessor arrays (first row's predecessor is the state)
            pxu = np.roll(xu, 1)
            pv = np.roll(v, 1)
            pbk = np.roll(bk, 1)
            if last_val is not None:
                pxu[0] = last_xu
                pv[0] = last_val
                pbk[0] = origin_us + ((last_xu - origin_us) // width_us) * width_us
                has_prev = np.ones(len(v), dtype=bool)
            else:
                has_prev = np.ones(len(v), dtype=bool)
                has_prev[0] = False
            same = has_prev & (pbk == bk)
            seg = np.where(same, pv * (xu - pxu), 0)
            gap = np.where(same, xu - pxu, 0)
            yield pd.DataFrame(
                {
                    "series": key[0],
                    "ts": pdf["ts"].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "val": v,
                    "seg_bucket_xu": np.where(same, pbk, bk),
                    "seg": seg,
                    "gap": gap,
                }
            )
            last_xu = int(xu[-1])
            last_id = int(ids0[order][-1])
            last_val = int(v[-1])
        if last_val is not None:
            state.update((last_xu, last_id, last_val))

    return derive


def streaming_twa(
    spark,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    schema: T.StructType,
    width_s: int = 3600,
    series_col: str = "event_type",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """File-source stream → per-series segment emission → parquet sink.
    Aggregate downstream per (series, bucket): num = Σ seg, den = Σ gap
    (== last_xu − first_xu within the bucket for in-order arrival), twa =
    num/den with the den-0 → first-value fallback — exactly the batch
    formula (parity pinned in pytest). Same in-order-per-series contract
    as streaming_counter_increase."""
    from ..operators.timeseries import TIME_BUCKET_ORIGIN_S

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_path)
    out = (
        stream.select(
            F.col(series_col).alias("series"), "ts", "event_id", "n_tok"
        )
        .groupBy("series")
        .applyInPandasWithState(
            _twa_fn(width_s * 1_000_000, TIME_BUCKET_ORIGIN_S * 1_000_000),
            TWA_OUT_SCHEMA,
            TWA_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


CHANGES_STATE_SCHEMA = COUNTER_STATE_SCHEMA  # same (last_xu, last_id, last_val)

CHANGES_OUT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("bucket_xu", T.LongType()),
        T.StructField("changed", T.IntegerType()),
    ]
)


def _changes_fn(width_us: int, origin_us: int):
    """Streaming twin of operators/timeseries.gauge_changes (and the
    changes_partials carrier): per series carry the last (ts, id, value);
    each arriving sample emits ``changed`` = 1 iff its value differs from
    its predecessor AND the predecessor lies in the SAME time bucket
    (cross-bucket pairs contribute nothing — the mergeable-tier
    convention). Bucketed sums of ``changed`` downstream equal the batch
    operator's ``n_changes`` exactly (pinned in pytest). Same in-order-
    across-micro-batches arrival assumption as the counter kernel;
    vectorized — one sort + one shift per micro-batch."""

    def derive(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_xu, last_id, last_val = (
            state.get if state.exists else (None, None, None)
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            xu = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            ids = pdf["event_id"].to_numpy(dtype="int64")
            order = np.lexsort((ids, xu))
            pdf = pdf.iloc[order]
            xu = xu[order]
            v = pdf["n_tok"].to_numpy(dtype="int64")
            bkt = origin_us + ((xu - origin_us) // width_us) * width_us
            prev_v = np.roll(v, 1)
            prev_b = np.roll(bkt, 1)
            changed = ((v != prev_v) & (bkt == prev_b)).astype("int32")
            if last_val is None:
                changed[0] = 0
            else:
                last_b = origin_us + ((last_xu - origin_us) // width_us) * width_us
                changed[0] = 1 if (v[0] != last_val and bkt[0] == last_b) else 0
            last_xu = int(xu[-1])
            last_id = int(ids[-1])
            last_val = int(v[-1])
            yield pd.DataFrame(
                {
                    "series": key[0],
                    "ts": pdf["ts"].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "bucket_xu": bkt,
                    "changed": changed,
                }
            )
        if last_val is not None:
            state.update((last_xu, last_id, last_val))

    return derive


def streaming_gauge_changes(
    spark,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    schema: T.StructType,
    width_s: int = 3600,
    series_col: str = "event_type",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """File-source stream → per-series stateful change flags → parquet
    sink (VERDICT r5 Next #5 streaming parity). Per-sample ``changed``
    contributions are integer-exact and within-bucket, so any downstream
    bucketed sum reproduces the batch ``gauge_changes`` tier; state per
    series is ONE (ts, id, value) triple — the counter kernel's memory
    posture."""
    from ..operators.timeseries import TIME_BUCKET_ORIGIN_S

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_path)
    out = (
        stream.select(
            F.col(series_col).alias("series"), "ts", "event_id", "n_tok"
        )
        .groupBy("series")
        .applyInPandasWithState(
            _changes_fn(width_s * 1_000_000, TIME_BUCKET_ORIGIN_S * 1_000_000),
            CHANGES_OUT_SCHEMA,
            CHANGES_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
