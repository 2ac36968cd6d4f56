"""Rollup tier tests: tier re-rollup bit-equal to direct recomputation,
gap-fill correctness, blob round-trip through Spark (FIXTURES.md §3)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from rasusa_spark.codecs.blobs import compress_metric_streams, decode_metric_streams
from rasusa_spark.operators.rollup import gap_fill, rollup, rollup_all_tiers, rollup_from_finer
from rasusa_spark.synth import tokens_raw_df


@pytest.fixture(scope="module")
def raw5k(spark):
    df = tokens_raw_df(spark, 5000, with_tokens=False, partitions=8).cache()
    df.count()
    return df


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.select("source", "bucket_start", "n_tok_sum", "row_count", "n_tok_min", "n_tok_max").collect())
    )


def test_rerollup_1d_bit_equal_to_direct(spark, raw5k):
    """1h→1d must equal raw→1d exactly (integer associativity)."""
    h1 = rollup(raw5k, "1h")
    d1_from_h1 = rollup_from_finer(h1, "1d")
    d1_direct = rollup(raw5k, "1d")
    assert _sorted_rows(d1_from_h1) == _sorted_rows(d1_direct)


def test_rerollup_1h_from_raw_tier(spark, raw5k):
    raw_tier = rollup(raw5k, "raw")
    h1_from_raw = rollup_from_finer(raw_tier, "1h")
    h1_direct = rollup(raw5k, "1h")
    assert _sorted_rows(h1_from_raw) == _sorted_rows(h1_direct)


def test_realtime_rollup_equals_direct(spark, raw5k):
    """Real-time continuous aggregate: materialized-before-watermark ∪
    live-tail must equal the direct rollup of all raw rows exactly — no
    gap, no double-count at the hour boundary (rows at ts == watermark go
    to the live side only)."""
    from rasusa_spark.operators.rollup import realtime_rollup

    wm = "2026-01-08 00:00:00"
    stored = rollup(raw5k.where(F.col("ts") < F.to_timestamp(F.lit(wm))), "1h")
    view = realtime_rollup(stored, raw5k, "1h", watermark=wm)
    assert _sorted_rows(view) == _sorted_rows(rollup(raw5k, "1h"))
    # stored/live halves are disjoint in bucket space
    n_total = view.count()
    assert n_total == view.select("source", "bucket_start").distinct().count()


def test_realtime_rollup_refuses_misaligned_watermark(spark, raw5k):
    from rasusa_spark.operators.rollup import realtime_rollup

    stored = rollup(raw5k, "1h")
    with pytest.raises(ValueError, match="not hour-aligned"):
        realtime_rollup(stored, raw5k, "1h", watermark="2026-01-08 00:30:00")
    with pytest.raises(ValueError, match="not day-aligned"):
        realtime_rollup(
            rollup(raw5k, "1d"), raw5k, "1d", watermark="2026-01-08 06:00:00"
        )


def test_rollup_totals_match_input(spark, raw5k):
    h1 = rollup(raw5k, "1h")
    agg = h1.agg(F.sum("n_tok_sum"), F.sum("row_count")).collect()[0]
    direct = raw5k.agg(F.sum("n_tok"), F.count(F.lit(1))).collect()[0]
    assert agg[0] == direct[0] and agg[1] == direct[1]


def test_gap_fill_dense_and_zeroed(spark, raw5k):
    h1 = gap_fill(rollup(raw5k, "1h"), "1h")
    pdf = h1.orderBy("source", "bucket_start").toPandas()
    for src, grp in pdf.groupby("source"):
        diffs = grp["bucket_start"].diff().dropna()
        assert (diffs == pd.Timedelta(hours=1)).all(), f"{src}: spine not dense"
    gaps = pdf[pdf["gap_filled"]]
    assert len(gaps) > 0, "fixture should contain empty hourly buckets"
    assert (gaps["n_tok_sum"] == 0).all() and (gaps["row_count"] == 0).all()
    assert gaps["n_tok_min"].isna().all() and gaps["n_tok_max"].isna().all()


def test_gap_fill_does_not_change_totals(spark, raw5k):
    h1 = rollup(raw5k, "1h")
    filled = gap_fill(h1, "1h")
    a = h1.agg(F.sum("n_tok_sum"), F.sum("row_count")).collect()[0]
    b = filled.agg(F.sum("n_tok_sum"), F.sum("row_count")).collect()[0]
    assert tuple(a) == tuple(b)


def test_rollup_all_tiers_cascade(spark, raw5k):
    tiers = rollup_all_tiers(raw5k)
    assert set(tiers) == {"raw", "1h", "1d"}
    d1 = tiers["1d"].where(~F.col("gap_filled"))
    direct = rollup(raw5k, "1d")
    assert _sorted_rows(d1) == _sorted_rows(direct)


def test_metric_blob_roundtrip(spark, raw5k):
    """decode(compress(rollup)) must reproduce the gap-filled series exactly."""
    h1 = gap_fill(rollup(raw5k, "1h"), "1h")
    blobs = compress_metric_streams(h1).toPandas()
    decoded = decode_metric_streams(blobs)
    truth = h1.select(
        F.col("source").alias("group_key"), "bucket_start", "n_tok_sum", "row_count"
    ).toPandas()
    merged = decoded.merge(
        truth, on=["group_key", "bucket_start"], suffixes=("_dec", "_true"), how="outer"
    )
    assert len(merged) == len(truth) == len(decoded)
    assert (merged["n_tok_sum_dec"] == merged["n_tok_sum_true"]).all()
    assert (merged["row_count_dec"] == merged["row_count_true"]).all()
    # compression actually compresses the timestamp stream
    raw_bytes = len(truth) * 8
    assert blobs["ts_blob"].map(len).sum() < raw_bytes / 4
