"""Mergeable distinct-count tier (functions/distinct.py): exact sorted-set
carrier re-rolls bit-equal; HLL sketch cascade estimates equal the direct
sketch; both layout-invariant."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from rasusa_spark.functions.distinct import (
    distinct_from_finer,
    distinct_partials,
    hll_estimates,
    hll_from_finer,
    hll_partials,
)

T0 = dt.datetime(2026, 3, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def visits(spark):
    """3 sources x 4 days of hourly visits; user ids drawn from a small
    pool so buckets genuinely overlap (distinct != count)."""
    rng = np.random.default_rng(11)
    rows = []
    for s in range(3):
        for i in range(2000):
            t = T0 + dt.timedelta(seconds=int(rng.integers(0, 4 * 86400)))
            rows.append((f"s{s}", int(rng.integers(0, 150)), t))
    return spark.createDataFrame(rows, "source string, user_id long, ts timestamp")


def test_exact_cascade_bit_equal(spark, visits):
    h1 = distinct_partials(visits, "1h", id_col="user_id")
    d_cascade = distinct_from_finer(h1, "1d")
    d_direct = distinct_partials(visits, "1d", id_col="user_id")
    a = {
        (r.source, r.bucket_start): (tuple(r.id_set), r.n_distinct)
        for r in d_cascade.collect()
    }
    b = {
        (r.source, r.bucket_start): (tuple(r.id_set), r.n_distinct)
        for r in d_direct.collect()
    }
    assert a == b  # identical SETS, not just counts: the state is mergeable
    assert len(a) == 12  # 3 sources x 4 days


def test_exact_counts_match_pandas(spark, visits):
    got = {
        (r.source, r.bucket_start): r.n_distinct
        for r in distinct_partials(visits, "1d", id_col="user_id").collect()
    }
    pdf = visits.toPandas()
    pdf["d"] = pdf["ts"].values.astype("datetime64[D]")
    ref = pdf.groupby(["source", "d"])["user_id"].nunique()
    for (src, d), n in ref.items():
        assert got[(src, d.to_pydatetime())] == n


def test_exact_layout_invariant(spark, visits):
    a = distinct_partials(visits.repartition(1), "1d", id_col="user_id")
    b = distinct_partials(
        visits.repartition(16, "user_id"), "1d", id_col="user_id"
    )
    ka = sorted((r.source, r.bucket_start, tuple(r.id_set)) for r in a.collect())
    kb = sorted((r.source, r.bucket_start, tuple(r.id_set)) for r in b.collect())
    assert ka == kb


def test_hll_cascade_estimates_equal_direct(spark, visits):
    """Sketch union is register-wise max — the 1h→1d union's estimate must
    equal the direct 1d sketch's estimate (state depends only on the item
    SET), and at this cardinality (≤150 « 2^12 registers) the estimate is
    exact."""
    ids = visits.withColumn("uid", visits.user_id.cast("string"))
    h1 = hll_partials(ids, "1h", id_col="uid")
    d_cascade = hll_estimates(hll_from_finer(h1, "1d"))
    d_direct = hll_estimates(hll_partials(ids, "1d", id_col="uid"))
    a = {
        (r.source, r.bucket_start): r.n_distinct_est for r in d_cascade.collect()
    }
    b = {
        (r.source, r.bucket_start): r.n_distinct_est for r in d_direct.collect()
    }
    assert a == b
    exact = {
        (r.source, r.bucket_start): r.n_distinct
        for r in distinct_partials(visits, "1d", id_col="user_id").collect()
    }
    for k, est in a.items():
        assert est == exact[k]  # lg_k=12 is exact at this cardinality


def test_exact_carrier_cardinality_guard(spark, visits):
    """VERDICT r4 Next #5: the exact carrier ERRORS (inside the plan, no
    extra pass) when a bucket exceeds max_set_size, pointing at HLL."""
    from pyspark.errors import SparkRuntimeException

    guarded = distinct_partials(visits, "1d", id_col="user_id", max_set_size=50)
    with pytest.raises(SparkRuntimeException, match="HLL carrier"):
        guarded.collect()
    # in-bound data passes untouched, and None disables the guard
    ok = distinct_partials(visits, "1d", id_col="user_id", max_set_size=150)
    off = distinct_partials(visits, "1d", id_col="user_id", max_set_size=None)
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, off.collect()))


def test_exact_from_finer_cardinality_guard(spark, visits):
    """The coarser union can cross the bound even if every finer bucket
    was in-bound — the guard re-applies on re-roll."""
    from pyspark.errors import SparkRuntimeException

    h1 = distinct_partials(visits, "1h", id_col="user_id")
    with pytest.raises(SparkRuntimeException, match="HLL carrier"):
        distinct_from_finer(h1, "1d", max_set_size=50).collect()
