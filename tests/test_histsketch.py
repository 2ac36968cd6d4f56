"""Mergeable log2-histogram quantile sketch (functions/histsketch.py):
integer-exact binning, bit-equal tier cascade, estimation error bound."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from pyspark.sql import functions as F

from rasusa_spark.functions.histsketch import (
    N_BINS,
    histogram_quantile,
    histogram_rollup,
    histogram_rollup_from_finer,
)

T0 = dt.datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def metric_df(spark):
    rng = np.random.RandomState(9)
    vals = np.concatenate(
        [
            rng.randint(1, 2000, size=3000),
            rng.geometric(0.001, size=1000),  # heavy tail
            [0, 0, 1, 1, 2, 4, 8, 1024, 2**20],
        ]
    )
    rows = [
        (
            "s" + str(i % 2),
            T0 + dt.timedelta(hours=int(i % 30), seconds=int(i)),
            int(v),
        )
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "source string, ts timestamp, n_tok long"
    ).cache()


def test_bin_assignment_integer_exact(spark):
    rows = [("x", T0, v) for v in [0, -3, 1, 2, 3, 4, 7, 8, 1023, 1024, 2**20]]
    df = spark.createDataFrame(rows, "source string, ts timestamp, n_tok long")
    hist = histogram_rollup(df, "1d").collect()[0].hist
    got = {b: c for b, c in enumerate(hist) if c > 0}
    # 0,-3 -> bin0; 1 -> bin1; 2,3 -> bin2; 4,7 -> bin3; 8 -> bin4;
    # 1023 -> bin10; 1024 -> bin11 (exact power-of-two edge!); 2^20 -> bin21
    assert got == {0: 2, 1: 1, 2: 2, 3: 2, 4: 1, 10: 1, 11: 1, 21: 1}


def test_cascade_bit_equal(spark, metric_df):
    direct = histogram_rollup(metric_df, "1d")
    rerolled = histogram_rollup_from_finer(
        histogram_rollup(metric_df, "1h"), "1d"
    )
    a = sorted(
        (r.source, r.bucket_start, tuple(r.hist)) for r in direct.collect()
    )
    b = sorted(
        (r.source, r.bucket_start, tuple(r.hist)) for r in rerolled.collect()
    )
    assert a == b and len(a) > 0


def test_hist_totals_match_row_counts(spark, metric_df):
    h = histogram_rollup(metric_df, "1h")
    tot = h.select(
        "source",
        "bucket_start",
        F.aggregate("hist", F.lit(0).cast("long"), lambda a, x: a + x).alias("n"),
    )
    counts = metric_df.groupBy(
        "source", F.date_trunc("hour", "ts").alias("bucket_start")
    ).count()
    joined = tot.join(counts, on=["source", "bucket_start"])
    assert joined.where(F.col("n") != F.col("count")).count() == 0


def test_quantile_estimate_error_bound(spark, metric_df):
    ests = histogram_quantile(
        histogram_rollup(metric_df, "1d"), probs=(0.5, 0.9, 0.99)
    ).collect()
    exact = {
        (r.source, r.bucket_start): (r.p50, r.p90, r.p99)
        for r in metric_df.groupBy(
            "source", F.date_trunc("day", "ts").alias("bucket_start")
        )
        .agg(
            F.expr("percentile(n_tok, 0.5)").alias("p50"),
            F.expr("percentile(n_tok, 0.9)").alias("p90"),
            F.expr("percentile(n_tok, 0.99)").alias("p99"),
        )
        .collect()
    }
    rel_errs = []
    for r in ests:
        ex = exact[(r.source, r.bucket_start)]
        for est, true in zip((r.q50_est, r.q90_est, r.q99_est), ex):
            if true >= 1:
                rel_errs.append(abs(est - true) / true)
    assert rel_errs and max(rel_errs) <= 0.35, f"max rel err {max(rel_errs):.3f}"
    assert float(np.median(rel_errs)) <= 0.12


def test_hist_layout_invariance(spark, metric_df):
    a = sorted(
        (r.source, r.bucket_start, tuple(r.hist))
        for r in histogram_rollup(metric_df, "1h").collect()
    )
    b = sorted(
        (r.source, r.bucket_start, tuple(r.hist))
        for r in histogram_rollup(metric_df.repartition(13), "1h").collect()
    )
    assert a == b


def test_n_bins_covers_int32(spark):
    df = spark.createDataFrame(
        [("x", T0, 2**31 - 1)], "source string, ts timestamp, n_tok long"
    )
    hist = histogram_rollup(df, "1d").collect()[0].hist
    assert len(hist) == N_BINS and hist[31] == 1


def test_overflow_clamps_to_top_bucket(spark):
    # ADVICE r3: values >= 2^31 on a LONG metric column used to match no
    # conditional count (silent row drop, hist total < row_count). They
    # now clamp into the top overflow bucket, keeping totals exact.
    df = spark.createDataFrame(
        [("x", T0, 2**40), ("x", T0, 2**62), ("x", T0, 5)],
        "source string, ts timestamp, n_tok long",
    )
    hist = histogram_rollup(df, "1d").collect()[0].hist
    assert sum(hist) == 3
    assert hist[N_BINS - 1] == 2  # both huge values in the overflow bucket
    assert hist[3] == 1           # 5 -> bit length 3
