"""Cohort retention, funnel conversion (operators/cohort.py), and rolling
z-score anomaly flags (operators/timeseries.py:rollup_anomaly)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from rasusa_spark.operators.cohort import cohort_retention, funnel

T0 = dt.datetime(2026, 5, 4, 0, 0, 0)


def test_cohort_retention_manual(spark):
    rows = [
        # cohort day 0: users 1, 2; user 1 returns d1 and d3, user 2 never
        (1, T0 + dt.timedelta(hours=5)),
        (2, T0 + dt.timedelta(hours=9)),
        (1, T0 + dt.timedelta(days=1, hours=2)),
        (1, T0 + dt.timedelta(days=3)),
        # cohort day 2: user 3, returns d+1
        (3, T0 + dt.timedelta(days=2, hours=1)),
        (3, T0 + dt.timedelta(days=3, hours=4)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_day, r.day_offset): (r.n_users, r.cohort_size, r.retention_rate)
        for r in cohort_retention(df).collect()
    }
    d0, d2 = T0, T0 + dt.timedelta(days=2)
    assert got == {
        (d0, 0): (2, 2, 1.0),
        (d0, 1): (1, 2, 0.5),
        (d0, 3): (1, 2, 0.5),
        (d2, 0): (1, 1, 1.0),
        (d2, 1): (1, 1, 1.0),
    }


def test_cohort_retention_matches_pandas(spark):
    rng = np.random.default_rng(31)
    rows = [
        (int(u), T0 + dt.timedelta(seconds=int(rng.integers(0, 14 * 86400))))
        for u in rng.integers(0, 60, size=3000)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["u", "ts"])
    pdf["day"] = pdf["ts"].values.astype("datetime64[D]")
    first = pdf.groupby("u")["day"].min().rename("cohort")
    act = pdf[["u", "day"]].drop_duplicates().join(first, on="u")
    act["off"] = (act["day"] - act["cohort"]).dt.days
    exp = act.groupby(["cohort", "off"])["u"].nunique()
    assert got == {
        (pd.Timestamp(c).to_pydatetime(), int(o)): int(n)
        for (c, o), n in exp.items()
    }


def test_funnel_strict_order_and_horizon(spark):
    rows = [
        # u1 completes view->click->buy
        (1, "view", 0), (1, "click", 10), (1, "buy", 20),
        # u2 clicks BEFORE viewing: click must not count
        (2, "click", 0), (2, "view", 10),
        # u3 view+click at the SAME ts: strictly-after fails
        (3, "view", 5), (3, "click", 5),
        # u4 completes but buy lands outside the 1-hour horizon
        (4, "view", 0), (4, "click", 30), (4, "buy", 4000),
    ]
    df = spark.createDataFrame(
        [(u, s, T0 + dt.timedelta(seconds=t)) for u, s, t in rows],
        "user_id long, event_type string, ts timestamp",
    )
    got = {
        r.step_idx: (r.step, r.n_users, r.conversion_rate)
        for r in funnel(df, ["view", "click", "buy"], within="1 hour").collect()
    }
    assert got == {
        0: ("view", 4, 1.0),
        1: ("click", 2, 0.5),  # u1 and u4
        2: ("buy", 1, 0.25),  # u1 only (u4 outside horizon)
    }
    # without horizon u4's buy counts
    got2 = {
        r.step_idx: r.n_users
        for r in funnel(df, ["view", "click", "buy"]).collect()
    }
    assert got2 == {0: 4, 1: 2, 2: 2}


def test_funnel_zero_step_row_present(spark):
    df = spark.createDataFrame(
        [(1, "view", T0)], "user_id long, event_type string, ts timestamp"
    )
    got = {
        r.step_idx: (r.n_users, r.conversion_rate)
        for r in funnel(df, ["view", "buy"]).collect()
    }
    assert got == {0: (1, 1.0), 1: (0, 0.0)}


def test_rollup_anomaly_flags_spike(spark):
    from rasusa_spark.operators.timeseries import rollup_anomaly

    # 47 calm buckets (values 100 +- 3 deterministic) then one 10x spike
    rng = np.random.default_rng(2)
    vals = [100 + int(rng.integers(-3, 4)) for _ in range(47)] + [1000]
    rows = [
        ("a", T0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_sum long"
    )
    out = {r.bucket_start: r for r in rollup_anomaly(df).collect()}
    spike = out[T0 + dt.timedelta(hours=47)]
    assert spike.is_anomaly and spike.z > 100
    # early buckets below min_history emit null z, never flagged
    early = out[T0 + dt.timedelta(hours=3)]
    assert early.z is None and early.is_anomaly is False
    calm = out[T0 + dt.timedelta(hours=30)]
    assert calm.is_anomaly is False and abs(calm.z) < 3


def test_rollup_anomaly_matches_numpy(spark):
    from rasusa_spark.operators.timeseries import rollup_anomaly

    rng = np.random.default_rng(13)
    rows = []
    for g in range(3):
        for i in range(100):
            rows.append((f"g{g}", T0 + dt.timedelta(hours=i), int(rng.integers(50, 5000))))
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_sum long"
    )
    got = {
        (r.source, r.bucket_start): r.z for r in rollup_anomaly(df).collect()
    }
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["g", "b", "v"]).sort_values(["g", "b"])
    for g, sub in pdf.groupby("g"):
        v = sub["v"].to_numpy().astype("int64")
        for i in range(len(v)):
            h = v[max(0, i - 24) : i]
            key = (g, sub["b"].iloc[i].to_pydatetime())
            if len(h) < 12:
                assert got[key] is None
                continue
            n = len(h)
            s1, s2 = int(h.sum()), int((h * h).sum())
            mean = float(s1) / n
            var = (float(s2) - float(s1) * mean) / (n - 1)
            exp = (float(v[i]) - mean) / np.sqrt(var)
            assert got[key] == pytest.approx(exp, rel=1e-12)


def test_event_transitions_manual(spark):
    from rasusa_spark.operators.cohort import event_transitions

    rows = [
        (1, 1, "a", 0), (1, 2, "b", 10), (1, 3, "a", 20),
        (2, 4, "a", 0), (2, 5, "a", 5),
        (3, 6, "b", 0),  # singleton: no transition
    ]
    df = spark.createDataFrame(
        [(u, e, s, T0 + dt.timedelta(seconds=t)) for u, e, s, t in rows],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("b", "a"): (1, 1.0),
        ("a", "a"): (1, 0.5),
    }


def test_event_transitions_probabilities_sum_to_one(spark):
    from rasusa_spark.operators.cohort import event_transitions

    rng = np.random.default_rng(41)
    rows = [
        (int(u), i, ["x", "y", "z"][int(rng.integers(3))],
         T0 + dt.timedelta(seconds=int(rng.integers(0, 86400))))
        for i, u in enumerate(rng.integers(0, 30, size=2000))
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    out = event_transitions(df).collect()
    by_from = {}
    for r in out:
        by_from.setdefault(r.from_type, []).append(r.p)
    for fr, ps in by_from.items():
        assert abs(sum(ps) - 1.0) < 1e-9
    total = sum(r.n for r in out)
    # every user contributes (count-1) transitions
    import pandas as pd

    cnt = pd.DataFrame(rows, columns=["u", "e", "s", "ts"]).groupby("u").size()
    assert total == int((cnt - 1).sum())


def test_cohort_retention_filled_triangle(spark):
    from rasusa_spark.operators.cohort import cohort_retention_filled

    rows = [
        # cohort day 0: users 1, 2; activity d0, d1, d3 (d2 is a GAP)
        (1, T0 + dt.timedelta(hours=5)),
        (2, T0 + dt.timedelta(hours=9)),
        (1, T0 + dt.timedelta(days=1, hours=2)),
        (1, T0 + dt.timedelta(days=3)),
        # cohort day 2: user 3, returns d+1 (last day = day 3)
        (3, T0 + dt.timedelta(days=2, hours=1)),
        (3, T0 + dt.timedelta(days=3, hours=4)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_day, r.day_offset): (r.n_users, r.cohort_size, r.retention_rate)
        for r in cohort_retention_filled(df).collect()
    }
    d0, d2 = T0, T0 + dt.timedelta(days=2)
    # full triangle: cohort d0 gets offsets 0..3 (zero at 2), cohort d2 0..1
    assert got == {
        (d0, 0): (2, 2, 1.0),
        (d0, 1): (1, 2, 0.5),
        (d0, 2): (0, 2, 0.0),
        (d0, 3): (1, 2, 0.5),
        (d2, 0): (1, 1, 1.0),
        (d2, 1): (1, 1, 1.0),
    }


def test_cohort_retention_filled_observed_cells_bit_equal(spark):
    from rasusa_spark.operators.cohort import (
        cohort_retention,
        cohort_retention_filled,
    )

    rng = np.random.default_rng(47)
    rows = [
        (int(u), T0 + dt.timedelta(seconds=int(rng.integers(0, 10 * 86400))))
        for u in rng.integers(0, 40, size=2000)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    base = {
        (r.cohort_day, r.day_offset): (r.n_users, r.cohort_size, r.retention_rate)
        for r in cohort_retention(df).collect()
    }
    filled = {
        (r.cohort_day, r.day_offset): (r.n_users, r.cohort_size, r.retention_rate)
        for r in cohort_retention_filled(df).collect()
    }
    # observed cells pass through bit-identical
    for k, v in base.items():
        assert filled[k] == v
    # every extra cell is an explicit zero, and offsets form a dense range
    import collections

    offsets = collections.defaultdict(set)
    last_day = dt.datetime.combine(max(ts for _, ts in rows).date(),
                                   dt.time())
    for (cd, off), (n, size, rate) in filled.items():
        offsets[cd].add(off)
        if (cd, off) not in base:
            assert n == 0 and rate == 0.0
    for cd, offs in offsets.items():
        want_max = (last_day - cd).days
        assert offs == set(range(0, want_max + 1))
