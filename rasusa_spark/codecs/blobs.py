"""Distributed metric-stream compression: pack each (group, tier) rollup
series into Gorilla/delta-of-delta blobs stored back as binary columns
(north_rule), and the inverse decode for verification.

Vectorized boundary: one ``applyInPandas`` per group — the series are
post-rollup (thousands of points), so the per-group encode is trivial CPU
next to the aggregation shuffle that produced them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .gorilla import dod_decode, dod_encode, xor_decode, xor_encode

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), False),
        T.StructField("n_points", T.LongType(), False),
        T.StructField("ts_blob", T.BinaryType(), False),       # dod(bucket epoch-seconds)
        T.StructField("sum_blob", T.BinaryType(), False),      # dod(n_tok_sum)
        T.StructField("count_blob", T.BinaryType(), False),    # dod(row_count)
        T.StructField("value_blob", T.BinaryType(), False),    # gorilla-xor(mean n_tok)
    ]
)


def compress_metric_streams(
    agg: DataFrame, group_cols: tuple[str, ...] | list[str] = ("source",)
) -> DataFrame:
    """Per group: order buckets by time, pack (ts, sum, count, mean) streams.
    Gap rows participate (zero sums), so decode reproduces the gap-filled
    series exactly."""
    group_cols = list(group_cols)
    cols = [*group_cols, "bucket_start", "n_tok_sum", "row_count"]

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start").reset_index(drop=True)
        ts = (pdf["bucket_start"].astype("int64") // 10**9).to_numpy()
        sums = pdf["n_tok_sum"].to_numpy(dtype=np.int64)
        counts = pdf["row_count"].to_numpy(dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            means = np.where(counts > 0, sums / np.maximum(counts, 1), np.nan)
        key = "\x1f".join(str(pdf[c].iloc[0]) for c in group_cols)
        return pd.DataFrame(
            {
                "group_key": [key],
                "n_points": [len(pdf)],
                "ts_blob": [dod_encode(ts)],
                "sum_blob": [dod_encode(sums)],
                "count_blob": [dod_encode(counts)],
                "value_blob": [xor_encode(means)],
            }
        )

    return agg.select(*cols).groupBy(*group_cols).applyInPandas(encode, BLOB_SCHEMA)


def decode_metric_streams(blobs_pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver/executor-side inverse of ``compress_metric_streams`` over a
    collected blob table — used by round-trip verification."""
    frames = []
    for _, row in blobs_pdf.iterrows():
        ts = dod_decode(row["ts_blob"])
        frames.append(
            pd.DataFrame(
                {
                    "group_key": row["group_key"],
                    "bucket_start": pd.to_datetime(ts * 10**9),
                    "n_tok_sum": dod_decode(row["sum_blob"]),
                    "row_count": dod_decode(row["count_blob"]),
                    "mean_n_tok": xor_decode(row["value_blob"]),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)
