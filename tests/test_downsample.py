"""End-to-end downsample tests: reference golden parity on the seed_tokens
fixture (tests/reproducibility.rs analogs), strategy equivalence, and
partition-layout invariance (SURVEY §2.11)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rasusa_spark.operators.downsample import downsample, one_pass_hash, selection_metrics
from rasusa_spark.synth import seed_tokens_df, tokens_raw_df

from .test_rng import ONE_PASS_GOLDENS, TWO_PASS_N10_GOLDENS


def kept_ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def golden_names(nums):
    return sorted(f"read{i}" for i in nums)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_num_mode_exact_matches_reference(spark, seed):
    """reproducibility.rs:6-68 — `reads -n 10 -s {seed}` on seed.fastq."""
    df = seed_tokens_df(spark)
    out = downsample(
        df, seed=seed, mode="num", num=10, strategy="exact", derive_group_seeds=False
    )
    assert kept_ids(out) == golden_names(TWO_PASS_N10_GOLDENS[seed])
    # token-array equality for every retained row (north_star invariant)
    rows = out.select("doc_id", "tokens", "n_tok").collect()
    assert all(r.tokens == [1, 2, 3, 4] and r.n_tok == 4 for r in rows)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_one_pass_matches_reference(spark, seed):
    """reproducibility.rs:71-129 — `reads --one-pass -f 0.5 -s {seed}`."""
    df = seed_tokens_df(spark)
    out = downsample(
        df, seed=seed, mode="one_pass", frac=0.5, derive_group_seeds=False
    )
    assert kept_ids(out) == golden_names(ONE_PASS_GOLDENS[seed])


def test_one_pass_preserves_input_order(spark):
    """tests/main.rs:911-947 — one-pass output preserves input order (we
    check the retained row_idx sequence is sorted when read in order)."""
    df = seed_tokens_df(spark)
    out = downsample(df, seed=1, mode="one_pass", frac=0.5, derive_group_seeds=False)
    idx = [r.row_idx for r in out.orderBy("row_idx").collect()]
    assert idx == sorted(idx)


def test_bases_mode_exact_micro_goldens(spark):
    """subsampler.rs:285-343 ByBases micro-cases, run through Spark."""
    rows = [(f"r{i}", [1], 50, "g", None, i) for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp, row_idx long"
    )
    out = downsample(
        df, seed=1, mode="bases", bases=100, strategy="exact", derive_group_seeds=False
    )
    assert kept_ids(out) == ["r1", "r2"]

    rows = [(f"r{i}", [1], 500, "g", None, i) for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp, row_idx long"
    )
    out = downsample(
        df, seed=1, mode="bases", bases=100, strategy="exact", derive_group_seeds=False
    )
    assert kept_ids(out) == ["r1"]


@pytest.fixture(scope="module")
def raw1k(spark):
    df = tokens_raw_df(spark, 1000, with_tokens=False, partitions=8).cache()
    df.count()
    return df


def test_bases_budget_semantics(spark, raw1k):
    """Kept n_tok sum must be in [budget, budget + max_kept_row) per group —
    the crossing row is kept, nothing after it (subsampler.rs:83-91)."""
    budget = 20_000
    out = downsample(raw1k, seed=7, mode="bases", bases=budget, strategy="threshold")
    stats = (
        out.groupBy("source")
        .agg(F.sum("n_tok").alias("s"), F.max("n_tok").alias("m"))
        .collect()
    )
    totals = {
        r.source: r.t
        for r in raw1k.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    assert stats, "no groups survived"
    for r in stats:
        if totals[r.source] <= budget:
            assert r.s == totals[r.source]  # under-budget group keeps all
        else:
            assert budget <= r.s < budget + r.m


def test_threshold_equals_window(spark, raw1k):
    """The two-phase threshold strategy must select the IDENTICAL set as the
    single-window strategy (same key order, same crossing rule)."""
    for mode, kw in [("bases", {"bases": 30_000}), ("num", {"num": 57}), ("frac", {"frac": 0.25})]:
        a = downsample(raw1k, seed=11, mode=mode, strategy="threshold", **kw)
        b = downsample(raw1k, seed=11, mode=mode, strategy="window", **kw)
        ids_a, ids_b = kept_ids(a), kept_ids(b)
        assert ids_a == ids_b, f"mode={mode}: threshold != window"


def test_num_mode_exact_count_per_group(spark, raw1k):
    out = downsample(raw1k, seed=3, mode="num", num=40, strategy="threshold")
    for r in out.groupBy("source").count().collect():
        assert r["count"] == 40


def test_frac_mode_count_per_group(spark, raw1k):
    counts = {r.source: r["count"] for r in raw1k.groupBy("source").count().collect()}
    out = downsample(raw1k, seed=3, mode="frac", frac=0.5, strategy="threshold")
    got = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    for src, n in counts.items():
        # rasusa rounds half AWAY from zero (Rust f64::round, reads.rs:529)
        assert got[src] == int(0.5 * n + 0.5)


def test_partition_layout_invariance(spark, raw1k):
    """Same seed ⇒ same kept set regardless of partitioning (the engine's
    analog of rasusa's thread-count invariance, mod.rs:283-306)."""
    a = downsample(raw1k, seed=5, mode="bases", bases=25_000, strategy="threshold")
    b = downsample(
        raw1k.repartition(17, "doc_id"),
        seed=5,
        mode="bases",
        bases=25_000,
        strategy="threshold",
    )
    assert kept_ids(a) == kept_ids(b)


def test_exact_strategy_multi_group_derived_seeds(spark, raw1k):
    """Exact strategy also works per-group with derived seeds and matches
    itself deterministically."""
    a = downsample(raw1k, seed=9, mode="num", num=25, strategy="exact")
    b = downsample(raw1k, seed=9, mode="num", num=25, strategy="exact")
    assert kept_ids(a) == kept_ids(b)
    for r in a.groupBy("source").count().collect():
        assert r["count"] == 25


def test_one_pass_hash_frac(spark, raw1k):
    out = one_pass_hash(raw1k, seed=13, frac=0.5)
    n = out.count()
    assert abs(n / 1000 - 0.5) < 0.08
    # deterministic
    assert one_pass_hash(raw1k, seed=13, frac=0.5).count() == n


def test_strict_mode_and_probability_shorthand(spark, raw1k):
    from rasusa_spark.sampler import StrictModeError
    from rasusa_spark.operators.downsample import realized_coverage_report

    # strict num: forums group has < 5000 rows
    with pytest.raises(StrictModeError, match="more than the input"):
        downsample(raw1k, seed=1, mode="num", num=5000, strict=True)
    # strict bases: budget above any group's total
    with pytest.raises(StrictModeError, match="more than the input"):
        downsample(raw1k, seed=1, mode="bases", bases=10**12, strict=True)
    # non-strict succeeds and keeps everything
    out = downsample(raw1k, seed=1, mode="bases", bases=10**12)
    assert out.count() == raw1k.count()

    # probability= rewrites to one-pass frac (reads.rs:202-207)
    a = downsample(raw1k, seed=2, probability=0.5, mode="frac")
    b = downsample(raw1k, seed=2, mode="one_pass", frac=0.5)
    assert kept_ids(a) == kept_ids(b)

    cov, met = realized_coverage_report(out, genome_size=1000, requested_coverage=1.0)
    assert cov > 1.0 and met


def test_selection_metrics(spark, raw1k):
    out = downsample(raw1k, seed=7, mode="num", num=50, strategy="threshold")
    m = selection_metrics(raw1k, out, ["source"]).collect()
    for r in m:
        assert r.kept_rows == 50
        assert 0 < r.realized_frac <= 1


def test_threshold_many_groups_matches_window(spark):
    """VERDICT r1 weak #7 regression: at 10^4 groups the (groups x buckets)
    histogram must not be force-broadcast; the threshold strategy still
    selects exactly the window strategy's set."""
    from pyspark.sql import functions as F

    from rasusa_spark.operators.downsample import downsample

    n_groups, per_group = 10_000, 6
    df = (
        spark.range(n_groups * per_group)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % n_groups).cast("string").alias("grp"),
            (F.col("id") % 97 + 10).cast("int").alias("n_tok"),
        )
    )
    kw = dict(seed=3, group_cols=("grp",), mode="bases", bases=150,
              id_col="doc_id", weight_col="n_tok")
    got_t = downsample(df, strategy="threshold", **kw)
    got_w = downsample(df, strategy="window", **kw)
    a = sorted(r.doc_id for r in got_t.select("doc_id").collect())
    b = sorted(r.doc_id for r in got_w.select("doc_id").collect())
    assert a == b and len(a) > 0


def test_empty_input_flows_through_pipeline(spark):
    """Empty-relation edge: downsample / rollup / gap_fill on a filtered-
    to-empty parquet scan return empty results instead of erroring (a
    micro-batch with no rows for a bucket is routine at scale)."""
    from rasusa_spark.operators.rollup import gap_fill, rollup

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("n_tok", F.round(F.col("value") * 100).cast("int"))
        .where(F.col("event_type") == "no_such_type")
    )
    kept = downsample(
        ev, seed=1, group_cols=("event_type",), mode="bases", bases=1000,
        id_col="event_id", weight_col="n_tok", strategy="threshold",
    )
    assert kept.count() == 0
    h1 = rollup(ev, "1h", group_cols=("event_type",))
    assert h1.count() == 0
    assert gap_fill(h1, "1h", group_cols=("event_type",)).count() == 0
