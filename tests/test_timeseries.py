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


# ---------------------------------------------------------------------------
# time_bucket / rollup_bucketed / M4 / LTTB
# ---------------------------------------------------------------------------


def _series_df(spark, n=500, seed=7, n_groups=3):
    """Deterministic jittered series: irregular timestamps, int metric."""
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        t = 0
        for i in range(n):
            t += int(rng.integers(1, 240))  # 1..239 s gaps
            rows.append(
                (
                    f"g{g}",
                    g * 1_000_000 + i,
                    T0 + dt.timedelta(seconds=t),
                    int(rng.integers(0, 10_000)),
                )
            )
    return spark.createDataFrame(
        rows, "source string, ev_id long, ts timestamp, n_tok int"
    )


def test_time_bucket_matches_manual_floor(spark):
    from rasusa_spark.operators.timeseries import (
        TIME_BUCKET_ORIGIN_S,
        time_bucket_expr,
    )

    df = _series_df(spark, n=200, n_groups=1)
    got = df.select(
        "ts", time_bucket_expr(900, "ts").alias("b")
    ).collect()
    for r in got:
        e = int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp())
        want = TIME_BUCKET_ORIGIN_S + ((e - TIME_BUCKET_ORIGIN_S) // 900) * 900
        assert int(r.b.replace(tzinfo=dt.timezone.utc).timestamp()) == want
        assert r.b <= r.ts


def test_time_bucket_origin_shift(spark):
    from rasusa_spark.operators.timeseries import time_bucket_expr

    df = _series_df(spark, n=50, n_groups=1)
    o = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    got = df.select(
        "ts", time_bucket_expr(3600, "ts", origin_s=o + 1800).alias("b")
    ).collect()
    for r in got:
        sec = int(r.b.replace(tzinfo=dt.timezone.utc).timestamp())
        assert (sec - (o + 1800)) % 3600 == 0


def test_time_bucket_bad_width(spark):
    from rasusa_spark.operators.timeseries import time_bucket_expr

    with pytest.raises(ValueError, match="width_s"):
        time_bucket_expr(0)


def test_rollup_bucketed_equals_pandas(spark):
    from rasusa_spark.operators.timeseries import (
        TIME_BUCKET_ORIGIN_S,
        rollup_bucketed,
    )

    df = _series_df(spark)
    got = {
        (r.source, r.bucket_start): (r.n_tok_sum, r.row_count, r.n_tok_min, r.n_tok_max)
        for r in rollup_bucketed(df, 900, group_cols=("source",)).collect()
    }
    pdf = df.toPandas()
    e = pdf["ts"].values.astype("datetime64[s]").astype("int64")
    b = TIME_BUCKET_ORIGIN_S + ((e - TIME_BUCKET_ORIGIN_S) // 900) * 900
    pdf["b"] = b.astype("datetime64[s]")
    ref = pdf.groupby(["source", "b"])["n_tok"].agg(["sum", "count", "min", "max"])
    assert len(got) == len(ref)
    for (src, bb), row in ref.iterrows():
        k = (src, bb.to_pydatetime())
        assert got[k] == (row["sum"], row["count"], row["min"], row["max"])


def test_m4_downsample_reference(spark):
    from rasusa_spark.operators.timeseries import m4_downsample

    df = _series_df(spark)
    out = m4_downsample(df, 1800, group_cols=("source",)).collect()
    pdf = df.toPandas().sort_values(["source", "ts", "n_tok"])
    from rasusa_spark.operators.timeseries import TIME_BUCKET_ORIGIN_S

    e = pdf["ts"].values.astype("datetime64[s]").astype("int64")
    pdf["b"] = (
        TIME_BUCKET_ORIGIN_S + ((e - TIME_BUCKET_ORIGIN_S) // 1800) * 1800
    ).astype("datetime64[s]")
    ref = pdf.groupby(["source", "b"])
    by_key = {(r.source, r.bucket_start): r for r in out}
    assert len(by_key) == ref.ngroups
    for (src, bb), g in ref:
        r = by_key[(src, bb.to_pydatetime())]
        assert r.v_min == g["n_tok"].min()
        assert r.v_max == g["n_tok"].max()
        # first/last under (ts, value) lexicographic order
        assert r.v_first == g.iloc[0]["n_tok"]
        assert r.v_last == g.iloc[-1]["n_tok"]
        assert r.ts_first == g.iloc[0]["ts"].to_pydatetime()
        assert r.ts_last == g.iloc[-1]["ts"].to_pydatetime()
        assert r.row_count == len(g)


def _lttb_reference(xs, vs, n_out):
    """Independent straight-from-the-paper LTTB reimplementation (floats
    throughout, same bucket-assignment formula)."""
    n = len(xs)
    if n <= n_out:
        return list(range(n))
    keep = [0]
    prev = 0
    n_mid = n_out - 2
    buckets = [[] for _ in range(n_mid + 1)]
    for i in range(1, n - 1):
        buckets[((i - 1) * n_mid) // (n - 2) + 1].append(i)
    for k in range(1, n_mid + 1):
        if k < n_mid:
            nxt = buckets[k + 1]
            cx = float(sum(int(xs[i]) for i in nxt)) / len(nxt)
            cy = float(sum(int(vs[i]) for i in nxt)) / len(nxt)
        else:
            cx, cy = float(xs[n - 1]), float(vs[n - 1])
        px, py = float(xs[prev]), float(vs[prev])
        best, best_a = None, -1.0
        for i in buckets[k]:
            a = abs((px - cx) * (float(vs[i]) - py) - (px - float(xs[i])) * (cy - py))
            if a > best_a:
                best, best_a = i, a
        keep.append(best)
        prev = best
    keep.append(n - 1)
    return keep


def test_lttb_matches_reference(spark):
    from rasusa_spark.operators.timeseries import lttb_downsample

    df = _series_df(spark, n=300, n_groups=2)
    out = lttb_downsample(
        df, 20, group_cols=("source",), id_col="ev_id"
    ).collect()
    got = {
        src: sorted(r.ev_id for r in out if r.source == src)
        for src in {"g0", "g1"}
    }
    pdf = df.toPandas()
    for src in ["g0", "g1"]:
        g = pdf[pdf["source"] == src].copy()
        g["xu"] = g["ts"].values.astype("datetime64[us]").astype("int64")
        g = g.sort_values(["xu", "ev_id"]).reset_index(drop=True)
        xs = (g["xu"] - g["xu"].min()).values
        keep = _lttb_reference(xs, g["n_tok"].values, 20)
        assert got[src] == sorted(g.iloc[keep]["ev_id"].tolist())
        assert len(got[src]) == 20


def test_lttb_small_group_passthrough(spark):
    from rasusa_spark.operators.timeseries import lttb_downsample

    df = _series_df(spark, n=10, n_groups=1)
    out = lttb_downsample(df, 20, group_cols=("source",), id_col="ev_id")
    assert out.count() == 10  # n <= n_out: untouched


def test_lttb_keeps_endpoints_and_layout_invariant(spark):
    from rasusa_spark.operators.timeseries import lttb_downsample

    df = _series_df(spark, n=250, n_groups=2)
    a = lttb_downsample(df.repartition(1), 12, group_cols=("source",), id_col="ev_id")
    b = lttb_downsample(
        df.repartition(16, "ev_id"), 12, group_cols=("source",), id_col="ev_id"
    )
    ra = sorted((r.source, r.ev_id) for r in a.collect())
    rb = sorted((r.source, r.ev_id) for r in b.collect())
    assert ra == rb
    pdf = df.toPandas()
    for src in ["g0", "g1"]:
        g = pdf[pdf["source"] == src].sort_values(["ts", "ev_id"])
        sel = [i for (s, i) in ra if s == src]
        assert g.iloc[0]["ev_id"] in sel and g.iloc[-1]["ev_id"] in sel
        assert len(sel) == 12


def test_lttb_bad_n_out(spark):
    from rasusa_spark.operators.timeseries import lttb_downsample

    df = _series_df(spark, n=5, n_groups=1)
    with pytest.raises(ValueError, match="n_out"):
        lttb_downsample(df, 2, group_cols=("source",), id_col="ev_id")


def test_lttb_max_points_inbound_groups_unchanged(spark):
    """The M4 pre-reduce must be a pure pass-through for groups within the
    bound: same selection with the guard on (default) and off."""
    from rasusa_spark.operators.timeseries import lttb_downsample

    df = _series_df(spark, n=300, n_groups=2)
    guarded = lttb_downsample(df, 20, group_cols=("source",), id_col="ev_id")
    unguarded = lttb_downsample(
        df, 20, group_cols=("source",), id_col="ev_id", max_points=None
    )
    key = lambda d: sorted((r.source, r.ev_id) for r in d.collect())  # noqa: E731
    assert key(guarded) == key(unguarded)


def test_lttb_max_points_validation(spark):
    from rasusa_spark.operators.timeseries import lttb_downsample

    df = _series_df(spark, n=5, n_groups=1)
    with pytest.raises(ValueError, match="max_points"):
        lttb_downsample(
            df, 20, group_cols=("source",), id_col="ev_id", max_points=40
        )


def test_lttb_mega_series_bounded(spark):
    """VERDICT r4 Next #4: a 10^7-point SINGLE group must not become one
    straggler/OOM gather — the distributed M4 pre-reduce caps the
    per-task points at max_points and the job finishes in bounded wall.
    Properties pinned: exact output size, endpoints kept, every selected
    point a real input point, selection sorted by time."""
    import time

    from rasusa_spark.operators.timeseries import lttb_downsample

    n = 10_000_000
    base_us = 1_767_225_600_000_000  # 2026-01-01 UTC in micros
    df = (
        spark.range(n)
        .select(
            F.lit("one").alias("source"),
            F.col("id").alias("ev_id"),
            F.timestamp_micros(
                F.lit(base_us) + F.col("id") * 1_000_000
            ).alias("ts"),
            # deterministic pseudo-signal, int32-safe
            ((F.col("id") * 2654435761) % 10_000).cast("int").alias("n_tok"),
        )
        .repartition(32)
    )
    t0 = time.time()
    out = lttb_downsample(
        df, 100, group_cols=("source",), id_col="ev_id", max_points=65_536
    ).collect()
    wall = time.time() - t0
    assert wall < 120, f"mega-series LTTB took {wall:.0f}s — gather not bounded"
    assert len(out) == 100
    ids = [r.ev_id for r in sorted(out, key=lambda r: r.ts)]
    assert ids[0] == 0 and ids[-1] == n - 1
    assert all(0 <= i < n for i in ids)
    assert ids == sorted(ids)


# ---------------------------------------------------------------------------
# sessionize / counter_increase / time_weighted_avg
# ---------------------------------------------------------------------------


def test_sessionize_known_boundaries(spark):
    from rasusa_spark.operators.timeseries import sessionize

    rows = [
        # user 1: two sessions (gap 30m; 40m break between them)
        (1, T0, 10),
        (1, T0 + dt.timedelta(minutes=10), 20),
        (1, T0 + dt.timedelta(minutes=25), 30),
        (1, T0 + dt.timedelta(minutes=65), 40),  # 40m after prev -> new
        # user 2: one singleton
        (2, T0 + dt.timedelta(hours=2), 7),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, n_tok int")
    out = {
        (r.user_id, r.session_start): (r.n_events, r.duration_s, r.n_tok_sum)
        for r in sessionize(df, "30 minutes", value_col="n_tok").collect()
    }
    assert out == {
        (1, T0): (3, 25 * 60, 60),
        (1, T0 + dt.timedelta(minutes=65)): (1, 0, 40),
        (2, T0 + dt.timedelta(hours=2)): (1, 0, 7),
    }


def test_sessionize_matches_pandas_and_layout_invariant(spark):
    from rasusa_spark.operators.timeseries import sessionize

    rng = np.random.default_rng(5)
    rows = []
    for u in range(20):
        t = 0
        for _ in range(60):
            t += int(rng.integers(30, 4000))  # mix of <gap and >gap jumps
            rows.append((u, T0 + dt.timedelta(seconds=t), int(rng.integers(100))))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, n_tok int")
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, "30 minutes").collect()
    )
    # pandas re-derivation: break where gap > 1800s
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["u", "ts", "v"]).sort_values(["u", "ts"])
    exp = []
    for u, g in pdf.groupby("u"):
        ts = g["ts"].tolist()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if (t - prev).total_seconds() > 1800:
                exp.append((u, start, prev, n))
                start, n = t, 0
            n += 1
            prev = t
        exp.append((u, start, prev, n))
    assert got == sorted(exp)
    got2 = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df.repartition(13), "30 minutes").collect()
    )
    assert got2 == got


def test_counter_increase_resets(spark):
    from rasusa_spark.operators.timeseries import counter_increase

    # counter: 10 -> 25 -> 3 (reset) -> 8 -> first sample of a 2nd series
    rows = [
        ("a", 1, T0 + dt.timedelta(seconds=10), 10),
        ("a", 2, T0 + dt.timedelta(seconds=20), 25),
        ("a", 3, T0 + dt.timedelta(seconds=30), 3),
        ("a", 4, T0 + dt.timedelta(seconds=40), 8),
        ("b", 5, T0 + dt.timedelta(seconds=15), 999),
    ]
    df = spark.createDataFrame(
        rows, "source string, ev long, ts timestamp, n_tok int"
    )
    out = {
        (r.source, r.bucket_start): (r.increase, r.n_resets, r.n_samples)
        for r in counter_increase(
            df, 3600, series_cols=("source",), id_col="ev"
        ).collect()
    }
    # a: 0 (first) + 15 + 3 (reset -> full value) + 5 = 23, one reset
    assert out == {("a", T0): (23, 1, 4), ("b", T0): (0, 0, 1)}


def test_counter_increase_matches_numpy(spark):
    from rasusa_spark.operators.timeseries import counter_increase

    df = _series_df(spark, n=400, seed=3)
    got = {
        (r.source, r.bucket_start): r.increase
        for r in counter_increase(
            df, 3600, series_cols=("source",), id_col="ev_id"
        ).collect()
    }
    pdf = df.toPandas().sort_values(["source", "ts", "ev_id"])
    exp = {}
    for src, g in pdf.groupby("source"):
        v = g["n_tok"].to_numpy()
        ts = g["ts"].values.astype("datetime64[us]").astype("int64")
        prev = np.roll(v, 1).astype("int64")
        contrib = np.where(v < prev, v, v - prev)
        contrib[0] = 0
        o_us = 946_857_600 * 1_000_000
        bk = o_us + ((ts - o_us) // 3_600_000_000) * 3_600_000_000
        for b in np.unique(bk):
            key = (src, np.datetime64(int(b), "us").astype("datetime64[us]").item())
            exp[key] = int(contrib[bk == b].sum())
    assert got == exp
    got2 = {
        (r.source, r.bucket_start): r.increase
        for r in counter_increase(
            df.repartition(11), 3600, series_cols=("source",), id_col="ev_id"
        ).collect()
    }
    assert got2 == got


def test_time_weighted_avg_manual(spark):
    from rasusa_spark.operators.timeseries import time_weighted_avg

    rows = [
        # v=10 for 30s, v=20 for 10s, last sample v=99 (weight 0)
        ("a", 1, T0 + dt.timedelta(seconds=0), 10),
        ("a", 2, T0 + dt.timedelta(seconds=30), 20),
        ("a", 3, T0 + dt.timedelta(seconds=40), 99),
        # singleton bucket -> twa = value
        ("b", 4, T0 + dt.timedelta(seconds=5), 77),
    ]
    df = spark.createDataFrame(
        rows, "source string, ev long, ts timestamp, n_tok int"
    )
    out = {
        (r.source,): (r.twa, r.n_samples)
        for r in time_weighted_avg(
            df, 3600, series_cols=("source",), id_col="ev"
        ).collect()
    }
    assert out[("a",)] == ((10 * 30 + 20 * 10) / 40.0, 3)
    assert out[("b",)] == (77.0, 1)


def test_time_weighted_avg_matches_numpy(spark):
    from rasusa_spark.operators.timeseries import time_weighted_avg

    df = _series_df(spark, n=300, seed=9)
    got = {
        (r.source, r.bucket_start): r.twa
        for r in time_weighted_avg(
            df, 3600, series_cols=("source",), id_col="ev_id"
        ).collect()
    }
    pdf = df.toPandas().sort_values(["source", "ts", "ev_id"])
    o_us = 946_857_600 * 1_000_000
    exp = {}
    for src, g in pdf.groupby("source"):
        ts = g["ts"].values.astype("datetime64[us]").astype("int64")
        v = g["n_tok"].to_numpy().astype("int64")
        bk = o_us + ((ts - o_us) // 3_600_000_000) * 3_600_000_000
        for b in np.unique(bk):
            m = bk == b
            x, vv = ts[m], v[m]
            key = (src, np.datetime64(int(b), "us").astype("datetime64[us]").item())
            if len(x) == 1 or x[-1] == x[0]:
                exp[key] = float(vv[0])
            else:
                num = int((vv[:-1] * np.diff(x)).sum())
                exp[key] = float(num) / float(int(x[-1] - x[0]))
    assert got == exp


def test_rollup_sliding_matches_manual_expansion(spark):
    from rasusa_spark.operators.timeseries import rollup_sliding

    df = _series_df(spark, n=200, seed=17)
    got = {
        (r.source, r.window_start): (
            r.n_tok_sum, r.row_count, r.n_tok_min, r.n_tok_max, r.window_end,
        )
        for r in rollup_sliding(df, 3600, 900, value_col="n_tok").collect()
    }
    pdf = df.toPandas()
    xu = pdf["ts"].values.astype("datetime64[us]").astype("int64")
    exp = {}
    for k in range(4):
        ws = (xu // 900_000_000) * 900_000_000 - k * 900_000_000
        for i in range(len(pdf)):
            key = (
                pdf["source"].iloc[i],
                np.datetime64(int(ws[i]), "us").astype("datetime64[us]").item(),
            )
            exp.setdefault(key, []).append(int(pdf["n_tok"].iloc[i]))
    import datetime as _dt

    assert set(got) == set(exp)
    for key, vals in exp.items():
        s, n, lo, hi, end = got[key]
        assert (s, n, lo, hi) == (sum(vals), len(vals), min(vals), max(vals))
        assert end == key[1] + _dt.timedelta(seconds=3600)
    # every row lands in exactly width/slide windows
    total_rows = sum(len(v) for v in exp.values())
    assert total_rows == 4 * len(pdf)

    with pytest.raises(ValueError):
        rollup_sliding(df, 3600, 700)


def test_gap_fill_bucketed_spine_and_flags(spark):
    from rasusa_spark.operators.timeseries import (
        gap_fill_bucketed,
        rollup_bucketed,
    )

    # 15-min buckets with a deliberate hole
    rows = [
        ("a", 1, T0, 10),
        ("a", 2, T0 + dt.timedelta(minutes=5), 20),
        # gap: 00:15 bucket empty
        ("a", 3, T0 + dt.timedelta(minutes=31), 7),
    ]
    df = spark.createDataFrame(
        rows, "source string, ev long, ts timestamp, n_tok int"
    )
    r = rollup_bucketed(df, 900, value_col="n_tok")
    out = {
        r_.bucket_start: (r_.n_tok_sum, r_.row_count, r_.gap_filled)
        for r_ in gap_fill_bucketed(r, 900).collect()
    }
    assert out == {
        T0: (30, 2, False),
        T0 + dt.timedelta(minutes=15): (0, 0, True),
        T0 + dt.timedelta(minutes=30): (7, 1, False),
    }

    with pytest.raises(ValueError):
        gap_fill_bucketed(r, 0)


# ---------------------------------------------------------------------------
# gauge_delta / topn_rollup (VERDICT r4 Next #7)


def test_gauge_delta_manual(spark):
    from rasusa_spark.operators.timeseries import gauge_delta

    # gauge goes up AND down; delta = last - first in (ts, id) order
    rows = [
        ("a", 1, T0 + dt.timedelta(seconds=10), 100),
        ("a", 2, T0 + dt.timedelta(seconds=20), 250),
        ("a", 3, T0 + dt.timedelta(seconds=30), 40),  # drops — no reset folding
        ("a", 4, T0 + dt.timedelta(seconds=40), 90),
        ("b", 5, T0 + dt.timedelta(seconds=15), 7),  # singleton bucket
        # same-ts tie inside one bucket: id breaks the order
        ("c", 9, T0 + dt.timedelta(seconds=5), 300),
        ("c", 8, T0 + dt.timedelta(seconds=5), 111),
    ]
    df = spark.createDataFrame(
        rows, "source string, ev long, ts timestamp, n_tok int"
    )
    out = {
        (r.source, r.bucket_start): (
            r.v_first, r.v_last, r.delta, r.n_samples, r.rate_per_s
        )
        for r in gauge_delta(
            df, 3600, series_cols=("source",), id_col="ev"
        ).collect()
    }
    assert out == {
        ("a", T0): (100, 90, -10, 4, -10 / 3600.0),
        ("b", T0): (7, 7, 0, 1, 0.0),
        ("c", T0): (111, 300, 189, 2, 189 / 3600.0),
    }


def test_gauge_delta_matches_numpy_and_layout_invariant(spark):
    from rasusa_spark.operators.timeseries import gauge_delta

    df = _series_df(spark, n=400, seed=11)
    got = {
        (r.source, r.bucket_start): (r.v_first, r.v_last, r.delta)
        for r in gauge_delta(
            df, 3600, series_cols=("source",), id_col="ev_id"
        ).collect()
    }
    pdf = df.toPandas().sort_values(["source", "ts", "ev_id"])
    o_us = 946_857_600 * 1_000_000
    exp = {}
    for src, g in pdf.groupby("source"):
        ts = g["ts"].values.astype("datetime64[us]").astype("int64")
        v = g["n_tok"].to_numpy().astype("int64")
        bk = o_us + ((ts - o_us) // 3_600_000_000) * 3_600_000_000
        for b in np.unique(bk):
            vv = v[bk == b]
            key = (src, np.datetime64(int(b), "us").astype("datetime64[us]").item())
            exp[key] = (int(vv[0]), int(vv[-1]), int(vv[-1] - vv[0]))
    assert got == exp
    got2 = {
        (r.source, r.bucket_start): (r.v_first, r.v_last, r.delta)
        for r in gauge_delta(
            df.repartition(13), 3600, series_cols=("source",), id_col="ev_id"
        ).collect()
    }
    assert got2 == got


def test_topn_rollup_manual_and_tiebreak(spark):
    from rasusa_spark.operators.timeseries import topn_rollup

    rows = [
        # bucket T0: u1=50, u2=30, u3=30 (tie with u2 -> key ASC), u4=5
        ("u1", 1, T0 + dt.timedelta(seconds=1), 50),
        ("u2", 2, T0 + dt.timedelta(seconds=2), 30),
        ("u3", 3, T0 + dt.timedelta(seconds=3), 20),
        ("u3", 4, T0 + dt.timedelta(seconds=4), 10),
        ("u4", 5, T0 + dt.timedelta(seconds=5), 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ev long, ts timestamp, n_tok int"
    )
    out = {
        (r.bucket_start, r.user_id): (r.value_sum, r.n_rows, r.n_keys)
        for r in topn_rollup(df, 3600, 2, key_col="user_id").collect()
    }
    # tie 30/30 between u2 and u3 at rank 2/3 -> u2 wins (key ASC)
    assert out == {
        (T0, "u1"): (50, 1, 1),
        (T0, "u2"): (30, 1, 1),
        (T0, "__others__"): (35, 3, 2),
    }
    with pytest.raises(ValueError):
        topn_rollup(df, 3600, 0, key_col="user_id")


def test_topn_rollup_conserves_totals_and_bounds_rows(spark):
    from rasusa_spark.operators.timeseries import topn_rollup

    df = _series_df(spark, n=500, seed=13, n_groups=8)  # 8 keys
    n = 3
    out = topn_rollup(
        df, 3600, n, key_col="source", value_col="n_tok"
    ).collect()
    # totals conserved per bucket
    import collections

    got_sum = collections.Counter()
    got_rows = collections.Counter()
    per_bucket = collections.Counter()
    for r in out:
        got_sum[r.bucket_start] += r.value_sum
        got_rows[r.bucket_start] += r.n_rows
        per_bucket[r.bucket_start] += 1
    pdf = df.toPandas()
    ts = pdf["ts"].values.astype("datetime64[us]").astype("int64")
    o_us = 946_857_600 * 1_000_000
    pdf["bk"] = (o_us + ((ts - o_us) // 3_600_000_000) * 3_600_000_000).astype(
        "datetime64[us]"
    )
    exp_sum = pdf.groupby("bk")["n_tok"].sum()
    exp_rows = pdf.groupby("bk").size()
    for bk, s in exp_sum.items():
        assert got_sum[bk.to_pydatetime()] == int(s)
        assert got_rows[bk.to_pydatetime()] == int(exp_rows[bk])
    # bounded output: at most n+1 rows per bucket
    assert max(per_bucket.values()) <= n + 1
    # layout invariance
    out2 = topn_rollup(
        df.repartition(17), 3600, n, key_col="source", value_col="n_tok"
    ).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_gauge_deriv_manual_and_numpy(spark):
    from rasusa_spark.operators.timeseries import gauge_deriv

    # simple exact line: v = 10 + 2*t  -> slope exactly 2.0
    rows = [
        ("a", T0 + dt.timedelta(seconds=t), 10 + 2 * t) for t in (0, 30, 60, 90)
    ] + [
        ("b", T0 + dt.timedelta(seconds=5), 999),  # singleton -> null
        ("c", T0 + dt.timedelta(seconds=7), 1),  # zero time-variance
        ("c", T0 + dt.timedelta(seconds=7), 5),
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp, n_tok int")
    out = {
        r.source: (r.n_samples, r.slope_per_s)
        for r in gauge_deriv(df, 3600, series_cols=("source",)).collect()
    }
    assert out["a"] == (4, 2.0)
    assert out["b"] == (1, None)
    assert out["c"] == (2, None)

    # random series vs numpy polyfit-style closed form
    big = _series_df(spark, n=300, seed=23)
    got = {
        (r.source, r.bucket_start): r.slope_per_s
        for r in gauge_deriv(big, 3600, series_cols=("source",)).collect()
    }
    pdf = big.toPandas()
    o_us = 946_857_600 * 1_000_000
    ts = pdf["ts"].values.astype("datetime64[us]").astype("int64")
    pdf["bk"] = o_us + ((ts - o_us) // 3_600_000_000) * 3_600_000_000
    pdf["t"] = (ts - pdf["bk"]) // 1_000_000
    for (src, bk), g in pdf.groupby(["source", "bk"]):
        t = g["t"].to_numpy().astype("int64")
        v = g["n_tok"].to_numpy().astype("int64")
        key = (src, np.datetime64(int(bk), "us").astype("datetime64[us]").item())
        n = len(t)
        den = float(n) * float((t * t).sum()) - float(t.sum()) * float(t.sum())
        if n < 2 or den == 0.0:
            assert got[key] is None
            continue
        exp = (float(n) * float((t * v).sum()) - float(t.sum()) * float(v.sum())) / den
        assert got[key] == pytest.approx(exp, rel=1e-12)


def test_heavy_hitters_exact_and_bounded(spark):
    from rasusa_spark.operators.timeseries import heavy_hitters

    rng = np.random.default_rng(29)
    # zipf-ish: user u appears ~ 1/(u+1) — a few dominate
    users = (1.0 / rng.random(3000) ** 0.7).astype("int64") % 40
    rows = [
        (int(u), T0 + dt.timedelta(seconds=int(rng.integers(0, 2 * 86400))))
        for u in users
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    phi = 0.05
    out = heavy_hitters(df, 86400, phi, key_col="user_id").collect()
    import collections

    # exact reference
    cnt = collections.Counter()
    tot = collections.Counter()
    o_us = 946_857_600 * 1_000_000
    for u, ts in rows:
        us = int(np.datetime64(ts, "us").astype("int64"))
        bk = o_us + ((us - o_us) // 86_400_000_000) * 86_400_000_000
        cnt[(bk, u)] += 1
        tot[bk] += 1
    exp = {
        (bk, u): (c, tot[bk], c / tot[bk])
        for (bk, u), c in cnt.items()
        if float(c) >= phi * float(tot[bk])
    }
    got = {
        (
            int(np.datetime64(r.bucket_start, "us").astype("int64")),
            r.user_id,
        ): (r.key_count, r.bucket_total, r.share)
        for r in out
    }
    assert got == exp
    # bounded output: at most 1/phi keys per bucket
    per_bucket = collections.Counter(bk for bk, _ in got)
    assert max(per_bucket.values()) <= int(1 / phi)
    with pytest.raises(ValueError):
        heavy_hitters(df, 86400, 0.0)


def test_heavy_hitters_feed_cms_estimate_guarantee(spark):
    """Composition: the heavy-hitter set is a valid bounded candidate
    side for cms_estimate, and est >= true for every candidate."""
    from rasusa_spark.functions.cms import cms_estimate, cms_partials
    from rasusa_spark.operators.timeseries import heavy_hitters

    rng = np.random.default_rng(31)
    rows = [
        (int(u), T0 + dt.timedelta(seconds=int(rng.integers(0, 86400))))
        for u in rng.integers(0, 30, size=2000)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp").withColumn(
        "source", F.lit("s")
    )
    hh = heavy_hitters(df, 86400, 0.02, key_col="user_id")
    cms = cms_partials(df, "1d", item_col="user_id", group_cols=("source",))
    cands = hh.select(F.col("user_id").cast("string").alias("item")).distinct()
    est = {
        r.item: r.est
        for r in cms_estimate(
            cms, cands, item_col="item", group_cols=("source",)
        ).collect()
    }
    true = {
        str(r.user_id): r.key_count for r in hh.collect()
    }
    for item, t in true.items():
        assert est[item] >= t


def test_deriv_cascade_bit_equal_to_direct(spark):
    """deriv_from_finer re-bases the integer moments exactly: cascading
    1h -> 1d statistics then finalizing must equal gauge_deriv computed
    directly from raw at 1d, bit-for-bit (slope doubles included), and
    be layout-invariant."""
    from rasusa_spark.operators.timeseries import (
        _deriv_finalize,
        deriv_from_finer,
        deriv_partials,
        gauge_deriv,
    )

    df = _series_df(spark, n=600, seed=37)
    direct = {
        (r.source, r.bucket_start): (r.n_samples, r.slope_per_s)
        for r in gauge_deriv(df, 86400, series_cols=("source",)).collect()
    }
    p1h = deriv_partials(df, 3600, series_cols=("source",))
    p1d = deriv_from_finer(p1h, 86400, series_cols=("source",))
    cascaded = {
        (r.source, r.bucket_start): (r.n_samples, r.slope_per_s)
        for r in _deriv_finalize(p1d, ("source",)).collect()
    }
    assert cascaded == direct  # exact, including float bit-equality
    p1d_b = deriv_from_finer(
        p1h.repartition(9), 86400, series_cols=("source",)
    )
    cascaded_b = {
        (r.source, r.bucket_start): (r.n_samples, r.slope_per_s)
        for r in _deriv_finalize(p1d_b, ("source",)).collect()
    }
    assert cascaded_b == cascaded


def test_gauge_changes_and_irate(spark):
    from rasusa_spark.operators.timeseries import gauge_changes, gauge_irate

    rows = [
        # series a: 5, 5, 7, 7, 3 -> 2 changes; last two (7@30, 3@40):
        # idelta -4, gap 10 s -> irate -0.4/s
        ("a", 1, T0 + dt.timedelta(seconds=0), 5),
        ("a", 2, T0 + dt.timedelta(seconds=10), 5),
        ("a", 3, T0 + dt.timedelta(seconds=20), 7),
        ("a", 4, T0 + dt.timedelta(seconds=30), 7),
        ("a", 5, T0 + dt.timedelta(seconds=40), 3),
        # series b: singleton
        ("b", 6, T0 + dt.timedelta(seconds=5), 9),
        # series c: last two at the SAME ts (id-ordered) -> zero gap
        ("c", 7, T0 + dt.timedelta(seconds=5), 1),
        ("c", 9, T0 + dt.timedelta(seconds=8), 4),
        ("c", 8, T0 + dt.timedelta(seconds=8), 2),
    ]
    df = spark.createDataFrame(
        rows, "source string, ev long, ts timestamp, n_tok int"
    )
    ch = {
        r.source: (r.n_changes, r.n_samples)
        for r in gauge_changes(
            df, 3600, series_cols=("source",), id_col="ev"
        ).collect()
    }
    assert ch == {"a": (2, 5), "b": (0, 1), "c": (2, 3)}
    ir = {
        r.source: (r.idelta, r.irate_per_s)
        for r in gauge_irate(
            df, 3600, series_cols=("source",), id_col="ev"
        ).collect()
    }
    assert ir["a"] == (-4, -4 / 10.0)
    assert ir["b"] == (None, None)
    # c: last two are ev=8 (v=2) then ev=9 (v=4) at the same ts ->
    # idelta 2, zero gap -> null rate
    assert ir["c"] == (2, None)

    # layout invariance + pandas cross-check on random data
    big = _series_df(spark, n=300, seed=41)
    got = {
        (r.source, r.bucket_start): (r.n_changes, r.n_samples)
        for r in gauge_changes(
            big, 3600, series_cols=("source",), id_col="ev_id"
        ).collect()
    }
    got2 = {
        (r.source, r.bucket_start): (r.n_changes, r.n_samples)
        for r in gauge_changes(
            big.repartition(7), 3600, series_cols=("source",), id_col="ev_id"
        ).collect()
    }
    assert got2 == got
    pdf = big.toPandas().sort_values(["source", "ts", "ev_id"])
    o_us = 946_857_600 * 1_000_000
    ts = pdf["ts"].values.astype("datetime64[us]").astype("int64")
    pdf["bk"] = o_us + ((ts - o_us) // 3_600_000_000) * 3_600_000_000
    for (src, bk), g in pdf.groupby(["source", "bk"]):
        v = g["n_tok"].to_numpy()
        key = (src, np.datetime64(int(bk), "us").astype("datetime64[us]").item())
        assert got[key] == (int((v[1:] != v[:-1]).sum()), len(v))


def test_topn_rollup_refuses_sentinel_key_collision(spark):
    """ADVICE r5: a GENUINE key equal to '__others__' must raise loudly
    instead of silently merging with the tail fold row."""
    from rasusa_spark.operators.timeseries import topn_rollup

    df = spark.createDataFrame(
        [
            ("__others__", 5, "2026-01-01 00:00:00"),
            ("u1", 3, "2026-01-01 00:10:00"),
            ("u2", 2, "2026-01-01 00:20:00"),
        ],
        "user_id string, n_tok int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(Exception, match="reserved sentinel"):
        topn_rollup(df, 86400, 1).collect()
    # clean keys are unaffected
    ok = topn_rollup(df.where(F.col("user_id") != "__others__"), 86400, 1)
    assert ok.count() == 2


# --- changes/irate mergeable carrier (VERDICT r5 Next #5) ------------------


def test_changes_carrier_cascade_bit_equal(spark):
    """changes_partials at 1h → changes_from_finer to 1d must bit-equal
    changes_partials at 1d from raw — and both finalizers must reproduce
    the direct gauge_changes / gauge_irate queries exactly."""
    import numpy as np

    from rasusa_spark.operators.timeseries import (
        changes_finalize,
        changes_from_finer,
        changes_partials,
        gauge_changes,
        gauge_irate,
        irate_finalize,
    )
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 3000, with_tokens=False, partitions=3)
    fine = changes_partials(raw, 3600)
    cascaded = changes_from_finer(fine, 86400)
    direct = changes_partials(raw, 86400)

    cols = [
        "source", "bucket_start", "n_changes", "n_samples",
        "u_first", "id_first", "v_first", "u_last", "id_last", "v_last",
        "u_prev", "id_prev", "v_prev",
    ]
    key = lambda d: sorted(tuple(r) for r in d.select(*cols).collect())
    assert key(cascaded) == key(direct) and direct.count() > 0

    # finalizers == direct query operators (including the 1d tier built
    # from the cascaded carrier, i.e. never touching raw)
    gc_key = lambda d: sorted(tuple(r) for r in d.collect())
    assert gc_key(changes_finalize(cascaded)) == gc_key(
        gauge_changes(raw, 86400)
    )
    assert gc_key(irate_finalize(cascaded)) == gc_key(gauge_irate(raw, 86400))

    # layout invariance of the carrier build
    fine13 = changes_partials(raw.repartition(13), 3600)
    assert key(changes_from_finer(fine13, 86400)) == key(direct)


def test_changes_fold_refuses_interleaved_parts(spark):
    """Per-part change counts do not compose across interleaved samples —
    the fold must raise, not silently mis-count."""
    from rasusa_spark.operators.timeseries import changes_fold, changes_partials
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 400, with_tokens=False, partitions=2)
    # two parts covering INTERLEAVED (odd/even row) slices of each bucket
    a = changes_partials(raw.where(F.col("row_idx") % 2 == 0), 86400)
    b = changes_partials(raw.where(F.col("row_idx") % 2 == 1), 86400)
    with pytest.raises(Exception, match="overlap"):
        changes_fold(a.unionByName(b), ["source"]).collect()


def test_topn_carrier_cascade_bit_equal(spark):
    """VERDICT r5 Next #8: topn_partials at 1h → topn_from_finer to 1d →
    topn_finalize must bit-equal topn_rollup at 1d from raw, under any
    layout."""
    from rasusa_spark.operators.timeseries import (
        topn_finalize,
        topn_from_finer,
        topn_partials,
        topn_rollup,
    )
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 3000, with_tokens=False, partitions=3)
    p1h = topn_partials(raw, 3600, key_col="doc_id", series_cols=("source",))
    p1d = topn_from_finer(p1h, 86400, key_col="doc_id", series_cols=("source",))
    got = topn_finalize(p1d, 3, key_col="doc_id", series_cols=("source",))
    want = topn_rollup(raw, 86400, 3, key_col="doc_id", series_cols=("source",))
    key = lambda d: sorted(tuple(r) for r in d.collect())
    assert key(got) == key(want) and want.count() > 0
    # layout invariance
    p1h13 = topn_partials(
        raw.repartition(13), 3600, key_col="doc_id", series_cols=("source",)
    )
    got13 = topn_finalize(
        topn_from_finer(p1h13, 86400, key_col="doc_id", series_cols=("source",)),
        3, key_col="doc_id", series_cols=("source",),
    )
    assert key(got13) == key(want)


# --- OHLC / candlestick tier -----------------------------------------------


def test_ohlc_manual_semantics(spark):
    """Open/close follow the (ts, id) total order (ties broken by id),
    high/low/volume are plain extremes/sums."""
    from rasusa_spark.operators.timeseries import ohlc_rollup

    rows = [
        ("a", "id2", dt.datetime(2026, 1, 1, 0, 5), 7),
        ("a", "id1", dt.datetime(2026, 1, 1, 0, 5), 3),   # tie -> id1 first
        ("a", "id9", dt.datetime(2026, 1, 1, 0, 40), 1),
        ("b", "id3", dt.datetime(2026, 1, 1, 0, 30), 5),  # singleton
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, ts timestamp, n_tok int"
    )
    out = {
        r.source: r
        for r in ohlc_rollup(df, 3600, series_cols=("source",)).collect()
    }
    a = out["a"]
    assert (a.v_open, a.v_high, a.v_low, a.v_close) == (3, 7, 1, 1)
    assert (a.volume, a.n_samples) == (11, 3)
    b = out["b"]
    assert (b.v_open, b.v_high, b.v_low, b.v_close) == (5, 5, 5, 5)


def test_ohlc_carrier_cascade_bit_equal(spark):
    """ohlc_partials at 1h → ohlc_from_finer to 1d must bit-equal
    ohlc_partials at 1d from raw, under any layout; finalize(direct) ==
    ohlc_rollup."""
    from rasusa_spark.operators.timeseries import (
        ohlc_finalize,
        ohlc_from_finer,
        ohlc_partials,
        ohlc_rollup,
    )
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 3000, with_tokens=False, partitions=3)
    fine = ohlc_partials(raw, 3600)
    cascaded = ohlc_from_finer(fine, 86400)
    direct = ohlc_partials(raw, 86400)
    key = lambda d: sorted(tuple(r) for r in d.collect())
    assert key(cascaded.select(*direct.columns)) == key(direct)
    assert direct.count() > 0
    assert key(ohlc_finalize(cascaded)) == key(ohlc_rollup(raw, 86400))
    # layout invariance
    fine13 = ohlc_partials(raw.repartition(13), 3600)
    assert key(ohlc_from_finer(fine13, 86400).select(*direct.columns)) == key(
        direct
    )


# --- state_agg / duration_in -----------------------------------------------


def test_state_durations_manual(spark):
    """LOCF segments, cross-bucket split, last-sample no-extrapolation,
    zero-length (tied) segments dropped."""
    from rasusa_spark.operators.timeseries import state_durations

    h = lambda m: dt.datetime(2026, 1, 1, 0, 0) + dt.timedelta(minutes=m)
    rows = [
        ("a", 1, h(10), "S1"),
        ("a", 2, h(50), "S2"),
        ("a", 3, h(90), "S1"),
        ("a", 4, h(120), "S3"),  # last sample: contributes nothing
    ]
    df = spark.createDataFrame(
        rows, "source string, event_id long, ts timestamp, state string"
    )
    out = state_durations(
        df, 3600, series_cols=("source",), state_col="state",
        id_col="event_id",
    )
    got = {
        (r.bucket_start.hour, r.state): (r.duration_us, r.n_segments)
        for r in out.collect()
    }
    m = 60 * 1_000_000
    assert got == {
        (0, "S1"): (40 * m, 1),
        (0, "S2"): (10 * m, 1),
        (1, "S2"): (30 * m, 1),
        (1, "S1"): (30 * m, 1),
    }
    # total time in states == observed span
    total = sum(v[0] for v in got.values())
    assert total == 110 * m


def test_state_durations_conservation_and_invariance(spark):
    """Σ duration per series == (last ts − first ts); result is layout-
    invariant (keys are data, not partitioning)."""
    from rasusa_spark.operators.timeseries import state_durations
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 2000, with_tokens=False, partitions=3)
    raw = raw.withColumn("state", (F.col("n_tok") % 3).cast("string"))
    out = state_durations(
        raw, 3600, series_cols=("source",), state_col="state",
        id_col="doc_id",
    )
    per_series = {
        r.source: r.total
        for r in out.groupBy("source")
        .agg(F.sum("duration_us").alias("total"))
        .collect()
    }
    spans = {
        r.source: r.span
        for r in raw.groupBy("source")
        .agg(
            (
                F.max(F.unix_micros(F.col("ts").cast("timestamp")))
                - F.min(F.unix_micros(F.col("ts").cast("timestamp")))
            ).alias("span")
        )
        .collect()
    }
    assert per_series == spans and len(per_series) > 0
    key = lambda d: sorted(tuple(r) for r in d.collect())
    out13 = state_durations(
        raw.repartition(13), 3600, series_cols=("source",),
        state_col="state", id_col="doc_id",
    )
    assert key(out13) == key(out)


# --- predict_linear / prom_rate --------------------------------------------


def test_predict_linear_matches_numpy(spark):
    """Slope/intercept from the integer sufficient statistics must match
    numpy's least squares on the same (whole-second t, value) points."""
    from rasusa_spark.operators.timeseries import predict_linear
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 1500, with_tokens=False, partitions=2)
    out = predict_linear(raw, 86400, 3600, series_cols=("source",))
    rows = raw.select(
        "source",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("n_tok").cast("long").alias("v"),
    ).collect()
    import collections

    pts = collections.defaultdict(list)
    day_us = 86400 * 1_000_000
    origin_us = 946_857_600 * 1_000_000
    for r in rows:
        b = origin_us + ((r.us - origin_us) // day_us) * day_us
        pts[(r.source, b)].append(((r.us - b) // 1_000_000, r.v))
    checked = 0
    for r in out.collect():
        b_us = int(r.bucket_start.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
        tv = pts[(r.source, b_us)]
        assert r.n_samples == len(tv)
        t = np.array([p[0] for p in tv], dtype=np.float64)
        v = np.array([p[1] for p in tv], dtype=np.float64)
        if len(tv) >= 2 and np.ptp(t) > 0:
            slope, intercept = np.polyfit(t, v, 1)
            assert r.slope_per_s == pytest.approx(slope, rel=1e-9)
            assert r.predicted == pytest.approx(
                intercept + slope * (86400 + 3600), rel=1e-9
            )
            checked += 1
        else:
            assert r.slope_per_s is None and r.predicted is None
    assert checked > 0


def _prom_rate_mirror(samples, bucket_us, width_s, counter=True):
    """Python mirror of the PromQL extrapolatedRate algorithm
    (promql/functions.go, public) with the engine's pinned operand order."""
    samples = sorted(samples)
    n = len(samples)
    if counter:
        inc = 0
        for k in range(1, n):
            prev, cur = samples[k - 1][2], samples[k][2]
            inc += cur if cur < prev else cur - prev
    else:
        inc = samples[-1][2] - samples[0][2] if n else 0
    if n < 2 or samples[-1][0] <= samples[0][0]:
        return inc, None, None
    w_us = width_s * 1_000_000
    dur_start = (samples[0][0] - bucket_us) / 1e6
    dur_end = (bucket_us + w_us - samples[-1][0]) / 1e6
    sampled = (samples[-1][0] - samples[0][0]) / 1e6
    avg = sampled / (n - 1.0)
    inc_d = float(inc)
    first_v = float(samples[0][2])
    if counter and inc_d > 0.0 and first_v >= 0.0:
        dur_zero = sampled * (first_v / inc_d)
        if dur_zero < dur_start:
            dur_start = dur_zero
    thr = avg * 1.1
    if dur_start >= thr:
        dur_start = avg / 2.0
    if dur_end >= thr:
        dur_end = avg / 2.0
    ext = inc_d * ((sampled + dur_start + dur_end) / sampled)
    return inc, ext, ext / float(width_s)


def test_prom_rate_extrapolation_semantics(spark):
    """Hand-pinned cases: full boundary extrapolation when samples reach
    near the edges, half-average when they don't, the counter zero-cap,
    reset folding, and the <2-samples null guard."""
    from rasusa_spark.operators.timeseries import prom_rate

    h = dt.datetime(2026, 1, 1, 0, 0)
    mk = lambda mn, sec=0: h + dt.timedelta(minutes=mn, seconds=sec)
    rows = [
        # series a: spread samples + a reset
        ("a", 1, mk(10), 10), ("a", 2, mk(20), 20), ("a", 3, mk(50), 5),
        # series b: clustered mid-bucket -> both edges get avg/2
        ("b", 1, mk(28), 40), ("b", 2, mk(30), 44),
        # series c: tiny first value -> zero-cap on the start side
        ("c", 1, mk(2), 1), ("c", 2, mk(58), 100),
        # series d: singleton -> null
        ("d", 1, mk(30), 7),
    ]
    df = spark.createDataFrame(
        rows, "source string, event_id long, ts timestamp, n_tok int"
    )
    out = {
        r.source: r
        for r in prom_rate(
            df, 3600, series_cols=("source",), id_col="event_id"
        ).collect()
    }
    bucket_us = int(h.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    us = lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    by_series = {}
    for s, i, t, v in rows:
        by_series.setdefault(s, []).append((us(t), i, v))
    for s in ("a", "b", "c"):
        inc, ext, rate = _prom_rate_mirror(by_series[s], bucket_us, 3600)
        r = out[s]
        assert r.increase == inc
        assert r.increase_ext == pytest.approx(ext, rel=1e-12)
        assert r.rate_per_s == pytest.approx(rate, rel=1e-12)
    # a: reset folded (10 + 5), factor 1.5 exactly
    assert out["a"].increase == 15
    assert out["a"].increase_ext == pytest.approx(22.5, rel=1e-12)
    # b: both edges clamped to avg/2 -> factor exactly 2
    assert out["b"].increase_ext == pytest.approx(8.0, rel=1e-12)
    # d: singleton
    assert out["d"].increase == 0
    assert out["d"].increase_ext is None and out["d"].rate_per_s is None


def test_rate_carrier_cascade_bit_equal(spark):
    """rate_partials at 1h → rate_from_finer to 1d must bit-equal
    rate_partials at 1d from raw (Σ increases + boundary contributions),
    and the finalizer over the cascaded carrier must reproduce the direct
    prom_rate query exactly — raw untouched by the coarse tier."""
    from rasusa_spark.operators.timeseries import (
        prom_rate,
        prom_rate_finalize,
        rate_from_finer,
        rate_partials,
    )
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 3000, with_tokens=False, partitions=3)
    fine = rate_partials(raw, 3600)
    cascaded = rate_from_finer(fine, 86400)
    direct = rate_partials(raw, 86400)
    key = lambda d: sorted(tuple(r) for r in d.collect())
    assert key(cascaded.select(*direct.columns)) == key(direct)
    assert direct.count() > 0
    got = prom_rate_finalize(cascaded, 86400)
    want = prom_rate(raw, 86400)
    assert key(got.select(*want.columns)) == key(want)
    # layout invariance
    fine13 = rate_partials(raw.repartition(13), 3600)
    assert key(rate_from_finer(fine13, 86400).select(*direct.columns)) == key(
        direct
    )
    # gauge mode (counter=False): plain last-first boundary algebra
    fine_g = rate_partials(raw, 3600, counter=False)
    casc_g = rate_from_finer(fine_g, 86400, counter=False)
    dir_g = rate_partials(raw, 86400, counter=False)
    assert key(casc_g.select(*dir_g.columns)) == key(dir_g)


def test_rate_fold_refuses_interleaved_parts(spark):
    """Per-part increases do not compose across interleaved samples —
    the fold must raise, not silently mis-sum."""
    from rasusa_spark.operators.timeseries import rate_fold, rate_partials
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 400, with_tokens=False, partitions=2)
    a = rate_partials(raw.where(F.col("row_idx") % 2 == 0), 86400)
    b = rate_partials(raw.where(F.col("row_idx") % 2 == 1), 86400)
    with pytest.raises(Exception, match="overlap"):
        rate_fold(a.unionByName(b), ["source"]).collect()


def test_twa_carrier_cascade_bit_equal(spark):
    """twa_partials at 1h → twa_from_finer to 1d must bit-equal
    twa_partials at 1d from raw (Σ integrals + LOCF boundary segments
    crossing the hour marks), and the finalizer over the cascaded
    carrier must reproduce time_weighted_avg exactly — raw untouched by
    the coarse tier."""
    from rasusa_spark.operators.timeseries import (
        time_weighted_avg,
        twa_finalize,
        twa_from_finer,
        twa_partials,
    )
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 3000, with_tokens=False, partitions=3)
    fine = twa_partials(raw, 3600)
    cascaded = twa_from_finer(fine, 86400)
    direct = twa_partials(raw, 86400)
    key = lambda d: sorted(tuple(r) for r in d.collect())
    assert key(cascaded.select(*direct.columns)) == key(direct)
    assert direct.count() > 0
    got = twa_finalize(cascaded)
    want = time_weighted_avg(raw, 86400)
    assert key(got.select(*want.columns)) == key(want)
    # layout invariance
    fine13 = twa_partials(raw.repartition(13), 3600)
    assert key(twa_from_finer(fine13, 86400).select(*direct.columns)) == key(
        direct
    )


def test_twa_fold_refuses_interleaved_parts(spark):
    """Per-part LOCF integrals do not compose across interleaved
    samples — the fold must raise, not silently mis-integrate."""
    from rasusa_spark.operators.timeseries import twa_fold, twa_partials
    from rasusa_spark.synth import tokens_raw_df

    raw = tokens_raw_df(spark, 400, with_tokens=False, partitions=2)
    a = twa_partials(raw.where(F.col("row_idx") % 2 == 0), 86400)
    b = twa_partials(raw.where(F.col("row_idx") % 2 == 1), 86400)
    with pytest.raises(Exception, match="overlap"):
        twa_fold(a.unionByName(b), ["source"]).collect()


def test_holt_winters_matches_python_mirror(spark):
    """holt_winters fold vs an independent Python replay of the PromQL
    recurrence (funcHoltWinters/calcTrendValue) on a hand-built series,
    plus the <2-sample guard, factor validation, and layout invariance."""
    from rasusa_spark.operators.timeseries import holt_winters

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    vals_a = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 13.0]
    for i, v in enumerate(vals_a):
        rows.append(("a", t0 + dt.timedelta(minutes=7 * i), i, v))
    rows.append(("b", t0 + dt.timedelta(minutes=3), 100, 5.0))  # 1 sample
    rows.append(("c", t0 + dt.timedelta(minutes=1), 200, 2.0))
    rows.append(("c", t0 + dt.timedelta(minutes=2), 201, 9.0))  # exactly 2
    df = spark.createDataFrame(rows, "source string, ts timestamp, "
                                     "doc_id long, value double")

    sf, tf = 0.4, 0.3

    def mirror(vals):
        s0, s1, b = vals[0], vals[1], vals[1] - vals[0]
        for v in vals[2:]:
            b = tf * (s1 - s0) + (1.0 - tf) * b
            s1, s0 = sf * v + (1.0 - sf) * (s1 + b), s1
        return round(s1, 6)

    got = {
        r.source: r.smoothed
        for r in holt_winters(
            df, 3600, sf, tf, value_col="value"
        ).collect()
    }
    assert got == {"a": mirror(vals_a), "c": mirror([2.0, 9.0])}
    assert "b" not in got  # < 2 samples emits nothing (PromQL guard)

    relaid = {
        r.source: r.smoothed
        for r in holt_winters(
            df.repartition(5), 3600, sf, tf, value_col="value"
        ).collect()
    }
    assert relaid == got

    with pytest.raises(ValueError, match=r"in \(0, 1\)"):
        holt_winters(df, 3600, 1.0, 0.3, value_col="value")
    with pytest.raises(ValueError, match=r"in \(0, 1\)"):
        holt_winters(df, 3600, 0.4, 0.0, value_col="value")
