"""Timeseries operators (operators/timeseries.py): as-of join semantics
(≤ match, ties, tolerance, leading nulls), LOCF / linear gap-fill against
a pandas reference, quantile rollup vs numpy."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from pyspark.sql import functions as F

from rasusa_spark.operators.rollup import gap_fill, rollup
from rasusa_spark.operators.timeseries import (
    asof_join,
    asof_join_skinny,
    gap_fill_locf,
    rollup_quantiles,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def quotes(spark):
    # right side: per-group "quotes" at minutes 10, 20, 20(dup ts), 40
    rows = [
        ("a", ts(10), 100),
        ("a", ts(20), 200),
        ("a", ts(40), 400),
        ("b", ts(5), 50),
    ]
    return spark.createDataFrame(rows, "source string, ts timestamp, px long")


def test_asof_join_semantics(spark, quotes):
    trades = spark.createDataFrame(
        [
            ("a", ts(9), 1),   # before first quote -> null
            ("a", ts(10), 2),  # equal ts -> matches (<=)
            ("a", ts(25), 3),  # between -> minute-20 quote
            ("a", ts(99), 4),  # after last -> minute-40 quote
            ("b", ts(6), 5),
            ("c", ts(50), 6),  # group with no quotes -> null
        ],
        "source string, ts timestamp, trade_id long",
    )
    out = {
        r.trade_id: (r.asof_ts, r.px)
        for r in asof_join(
            trades, quotes, on="ts", by=("source",), value_cols=("px",)
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (ts(10), 100)
    assert out[3] == (ts(20), 200)
    assert out[4] == (ts(40), 400)
    assert out[5] == (ts(5), 50)
    assert out[6] == (None, None)


def test_asof_join_tolerance(spark, quotes):
    trades = spark.createDataFrame(
        [("a", ts(25), 1), ("a", ts(90), 2)],
        "source string, ts timestamp, trade_id long",
    )
    out = {
        r.trade_id: (r.asof_ts, r.px)
        for r in asof_join(
            trades, quotes, on="ts", by=("source",), value_cols=("px",),
            tolerance="10 minutes",
        ).collect()
    }
    assert out[1] == (ts(20), 200)       # 5 min old: inside tolerance
    assert out[2] == (None, None)        # 50 min old: nulled


def test_asof_join_forward(spark, quotes):
    trades = spark.createDataFrame(
        [
            ("a", ts(9), 1),   # next quote at 10
            ("a", ts(10), 2),  # equal ts -> matches (>=)
            ("a", ts(25), 3),  # next quote at 40
            ("a", ts(99), 4),  # after last -> null
            ("b", ts(6), 5),   # no following quote in group b -> null
            ("c", ts(50), 6),  # group with no quotes -> null
        ],
        "source string, ts timestamp, trade_id long",
    )
    out = {
        r.trade_id: (r.asof_ts, r.px)
        for r in asof_join(
            trades, quotes, on="ts", by=("source",), value_cols=("px",),
            direction="forward",
        ).collect()
    }
    assert out[1] == (ts(10), 100)
    assert out[2] == (ts(10), 100)
    assert out[3] == (ts(40), 400)
    assert out[4] == (None, None)
    assert out[5] == (None, None)
    assert out[6] == (None, None)


def test_asof_join_forward_tolerance(spark, quotes):
    trades = spark.createDataFrame(
        [("a", ts(35), 1), ("a", ts(12), 2)],
        "source string, ts timestamp, trade_id long",
    )
    out = {
        r.trade_id: (r.asof_ts, r.px)
        for r in asof_join(
            trades, quotes, on="ts", by=("source",), value_cols=("px",),
            tolerance="6 minutes", direction="forward",
        ).collect()
    }
    assert out[1] == (ts(40), 400)   # 5 min ahead: inside tolerance
    assert out[2] == (None, None)    # next quote 8 min ahead: nulled


def test_asof_join_nearest(spark, quotes):
    trades = spark.createDataFrame(
        [
            ("a", ts(12), 1),   # 2 back vs 8 fwd -> backward (10, 100)
            ("a", ts(17), 2),   # 7 back vs 3 fwd -> forward (20, 200)
            ("a", ts(15), 3),   # exact tie 5/5 -> backward wins (10, 100)
            ("a", ts(5), 4),    # nothing behind -> forward (10, 100)
            ("a", ts(99), 5),   # nothing ahead -> backward (40, 400)
            ("c", ts(50), 6),   # no quotes at all -> null
        ],
        "source string, ts timestamp, trade_id long",
    )
    out = {
        r.trade_id: (r.asof_ts, r.px)
        for r in asof_join(
            trades, quotes, on="ts", by=("source",), value_cols=("px",),
            direction="nearest",
        ).collect()
    }
    assert out[1] == (ts(10), 100)
    assert out[2] == (ts(20), 200)
    assert out[3] == (ts(10), 100)
    assert out[4] == (ts(10), 100)
    assert out[5] == (ts(40), 400)
    assert out[6] == (None, None)


def test_asof_join_nearest_tolerance(spark, quotes):
    # trade at 29: back quote 9 min old (outside 5-min tol), fwd quote 11
    # ahead (outside) -> null; trade at 37: fwd quote 3 ahead -> kept
    trades = spark.createDataFrame(
        [("a", ts(29), 1), ("a", ts(37), 2)],
        "source string, ts timestamp, trade_id long",
    )
    out = {
        r.trade_id: (r.asof_ts, r.px)
        for r in asof_join(
            trades, quotes, on="ts", by=("source",), value_cols=("px",),
            tolerance="5 minutes", direction="nearest",
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (ts(40), 400)


def test_asof_join_value_col_collision_raises(spark, quotes):
    trades = spark.createDataFrame(
        [("a", ts(9), 7)], "source string, ts timestamp, px long"
    )
    with pytest.raises(ValueError, match="collide with left columns"):
        asof_join(trades, quotes, by=("source",), value_cols=("px",))


def test_asof_join_bad_direction_raises(spark, quotes):
    trades = spark.createDataFrame(
        [("a", ts(9), 7)], "source string, ts timestamp, trade_id long"
    )
    with pytest.raises(ValueError, match="unknown direction"):
        asof_join(
            trades, quotes, by=("source",), value_cols=("px",),
            direction="sideways",
        )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_skinny_equals_wide(spark, quotes, direction):
    # wide left rows (a payload column) — the skinny variant must return
    # the same matches as the plain carry in every direction
    trades = spark.createDataFrame(
        [
            ("a", ts(m), m, list(range(m, m + 8)))
            for m in range(0, 120, 7)
        ]
        + [("c", ts(50), 999, [1, 2, 3])],
        "source string, ts timestamp, trade_id long, payload array<int>",
    )
    wide = sorted(
        (r.trade_id, r.asof_ts, r.px, tuple(r.payload))
        for r in asof_join(
            trades, quotes, by=("source",), value_cols=("px",),
            direction=direction,
        ).collect()
    )
    skinny = sorted(
        (r.trade_id, r.asof_ts, r.px, tuple(r.payload))
        for r in asof_join_skinny(
            trades, quotes, left_key="trade_id", by=("source",),
            value_cols=("px",), direction=direction,
        ).collect()
    )
    assert wide == skinny and len(wide) == 19


def test_asof_join_skinny_bad_key_raises(spark, quotes):
    trades = spark.createDataFrame(
        [("a", ts(9), 7)], "source string, ts timestamp, trade_id long"
    )
    with pytest.raises(ValueError, match="not in left columns"):
        asof_join_skinny(trades, quotes, left_key="nope", by=("source",))


def test_asof_join_layout_invariant(spark, quotes):
    trades = spark.createDataFrame(
        [("a", ts(m), m) for m in range(0, 120, 7)],
        "source string, ts timestamp, trade_id long",
    )
    a = sorted(
        (r.trade_id, r.asof_ts, r.px)
        for r in asof_join(trades, quotes, by=("source",), value_cols=("px",)).collect()
    )
    b = sorted(
        (r.trade_id, r.asof_ts, r.px)
        for r in asof_join(
            trades.repartition(7), quotes.repartition(3), by=("source",),
            value_cols=("px",),
        ).collect()
    )
    assert a == b


def _hourly_gapped(spark):
    # observations at hours 0, 3, 4, 8 — gaps at 1, 2, 5, 6, 7
    rows = [
        ("x", T0 + dt.timedelta(hours=h, minutes=1), v)
        for h, v in [(0, 10), (3, 40), (4, 20), (8, 80)]
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp, n_tok int")
    return gap_fill(rollup(df, "1h"), "1h")


def test_gap_fill_locf(spark):
    out = {
        r.bucket_start.hour: r.n_tok_sum_filled
        for r in gap_fill_locf(_hourly_gapped(spark)).collect()
    }
    assert out == {0: 10, 1: 10, 2: 10, 3: 40, 4: 20, 5: 20, 6: 20, 7: 20, 8: 80}


def test_gap_fill_linear(spark):
    out = {
        r.bucket_start.hour: r.n_tok_sum_filled
        for r in gap_fill_locf(_hourly_gapped(spark), method="linear").collect()
    }
    assert out[0] == 10.0 and out[3] == 40.0          # observations unchanged
    assert out[1] == pytest.approx(20.0)              # 10 -> 40 over 3h
    assert out[2] == pytest.approx(30.0)
    assert out[5] == pytest.approx(35.0)              # 20 -> 80 over 4h
    assert out[6] == pytest.approx(50.0)
    assert out[7] == pytest.approx(65.0)


def test_gap_fill_linear_leading_trailing_null(spark):
    # single observation bracketed by spine gaps via explicit span
    rows = [("x", T0 + dt.timedelta(hours=2), 7)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, n_tok int")
    filled = gap_fill(
        rollup(df, "1h"), "1h",
        span=("2026-01-01 00:00:00", "2026-01-01 04:00:00"),
    )
    out = {
        r.bucket_start.hour: r.n_tok_sum_filled
        for r in gap_fill_locf(filled, method="linear").collect()
    }
    assert out[2] == 7.0
    assert out[0] is None and out[1] is None  # before first obs
    assert out[3] is None and out[4] is None  # after last obs


def test_rollup_quantiles_match_numpy(spark):
    rng = np.random.RandomState(5)
    vals = rng.randint(1, 1000, size=500)
    rows = [
        ("x", T0 + dt.timedelta(hours=int(i % 3), seconds=int(i)), int(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp, n_tok int")
    got = {
        r.bucket_start.hour: (r.p50, r.p90, r.row_count)
        for r in rollup_quantiles(df, "1h", probs=(0.5, 0.9)).collect()
    }
    for h in (0, 1, 2):
        sub = vals[np.arange(len(vals)) % 3 == h]
        assert got[h][0] == pytest.approx(np.quantile(sub, 0.5), abs=1e-6)
        assert got[h][1] == pytest.approx(np.quantile(sub, 0.9), abs=1e-6)
        assert got[h][2] == len(sub)
