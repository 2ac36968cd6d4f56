"""Distributed downsample operator — the engine's heart.

Re-expresses the reference's subsampling modes (reference src/subsampler.rs,
src/reads.rs, src/fastx.rs) as per-``(source, bucket)`` window operators over
the token table:

===========  ===============================================================
mode         semantics (reference)
===========  ===============================================================
``bases``    keep rows in shuffled order until cumulative kept ``n_tok``
             crosses the budget; the crossing row IS kept
             (ByBases, subsampler.rs:79-93)
``num``      keep exactly min(k, n) rows (ByReads, subsampler.rs:94-104)
``frac``     k = round(frac × n) then ByReads (reads.rs:516-541)
``one_pass`` i-th row kept ⟺ i-th Bernoulli(frac) draw of Pcg64(seed)
             (fastx.rs:127-160) — jump-ahead makes it order-free parallel
===========  ===============================================================

Three physical strategies for the budget/k modes:

- ``exact``     — bit-parity with the reference: gather each group's
                  (order, weight) pairs in ``applyInPandas`` and run the
                  ported RNG kernel. Narrow projection only (12 B/row — the
                  reference's "lengths-only pass 1", reads.rs:445-449);
                  retained rows rejoin by key. Groups must fit an executor.
- ``window``    — one shuffle: random key per row (``xxhash64`` of group
                  seed + doc_id), per-group running-sum window, keep while
                  the preceding cumulative weight < budget. Same crossing
                  semantics, deterministic across cluster sizes, but one
                  task per group.
- ``threshold`` — the 100 TB path. Two-phase: (1) bucketize the key space,
                  aggregate per-bucket weight (map-side combinable shuffle),
                  (2) per group find the boundary bucket where the running
                  total crosses the budget; buckets strictly below are kept
                  wholesale, above dropped, and ONLY the boundary bucket
                  (≈ total/n_buckets of the group) goes through the exact
                  window. Selects the identical set as ``window`` at a tiny
                  fraction of its critical-path cost; no full-group sort
                  anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import sampler
from ..rng import MASK64, pcg64_bernoulli_keys

#: number of key-space buckets for the threshold strategy; the boundary slice
#: is ~1/1024 of each group, so the residual window is negligible at any
#: scale, while the (groups × buckets) histogram stays broadcast-sized.
N_KEY_BUCKETS = 1024

_GSEED = "_rs_gseed"
_KEY = "_rs_key"

#: DataFrames persisted by the threshold strategy, pending release. A
#: long-lived session that runs many threshold downsamples should call
#: release_threshold_caches() once each result is materialized — the
#: persist is needed only while the kept-whole and boundary branches of ONE
#: query are both live (ADVICE r1: the round-1 version never unpersisted).
_THRESHOLD_CACHES: list[DataFrame] = []


def release_threshold_caches() -> None:
    """Unpersist every cached subtree the threshold strategy has registered
    since the last release. Safe to call at any time AFTER the downsample
    results have been materialized (written / collected); calling it while a
    result is still lazy merely costs a recompute, never correctness."""
    while _THRESHOLD_CACHES:
        _THRESHOLD_CACHES.pop().unpersist()


def _with_group_seed(df: DataFrame, group_cols: list[str], seed: int, derive: bool) -> DataFrame:
    """Per-group seed = xxhash64(seed, group cols) — JVM-side, deterministic,
    independent of partition layout (SURVEY §2.11: results must be
    cluster-size-invariant). ``derive=False`` reproduces the reference's
    single-stream CLI behaviour (group seed ≡ seed) for parity fixtures."""
    if derive and group_cols:
        expr = F.xxhash64(F.lit(f"rasusa-spark:{seed}"), *[F.col(c) for c in group_cols])
    else:
        expr = F.lit(seed).cast("long")
    return df.withColumn(_GSEED, expr)


def _with_key(
    df: DataFrame,
    id_col: str,
    key_expr=None,
    seed: int = 0,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row uniform 64-bit key = one flat xxhash64 over
    (seed, group cols, doc id) — a single JVM hash call per row; this IS the
    hot path of the key strategies, so no nested hashing. Signed order of
    xxhash64 output is itself a uniform order. ``key_expr`` overrides the
    key (e.g. an arithmetic hash expressible in ANSI SQL for oracle
    cross-checks)."""
    if key_expr is None:
        parts = [F.lit(int(seed)).cast("long")]
        parts += [F.col(c) for c in (group_cols or [])]
        key_expr = F.xxhash64(*parts, F.col(id_col))
    return df.withColumn(_KEY, key_expr)


def resolve_budget(
    bases: int | None = None,
    coverage: float | None = None,
    genome_size: int | None = None,
) -> int:
    """--bases wins over coverage×genome-size (reads.rs:435-443), f32
    contract for the product (cli.rs:313-319)."""
    if bases is not None:
        return int(bases)
    if coverage is not None and genome_size is not None:
        return sampler.target_bases_from_coverage(genome_size, coverage)
    raise ValueError("need bases= or (coverage= and genome_size=)")


# --------------------------------------------------------------------------
# exact strategy (reference bit-parity)
# --------------------------------------------------------------------------


def _exact_select(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    weight_col: str,
    mode: str,
    budget: float,
) -> DataFrame:
    """Narrow-projection applyInPandas running the ported RNG kernel per
    group; returns (group_cols..., order_col) of retained rows."""
    out_fields = [df.schema[c] for c in group_cols] + [df.schema[order_col]]
    out_schema = T.StructType(out_fields)
    cols = [*group_cols, order_col, weight_col, _GSEED]

    def select(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        gseed = int(pdf[_GSEED].iloc[0]) & MASK64
        n = len(pdf)
        if mode == "bases":
            res = sampler.select_by_bases(
                pdf[weight_col].to_numpy(), int(budget), gseed
            )
        elif mode == "num":
            res = sampler.select_by_reads(n, int(budget), gseed)
        elif mode == "frac":
            k = sampler.num_from_frac(float(budget), n)
            res = sampler.select_by_reads(n, k, gseed)
        else:  # pragma: no cover
            raise ValueError(mode)
        return pdf.loc[res.keep, [*group_cols, order_col]]

    return df.select(*cols).groupBy(*group_cols).applyInPandas(select, out_schema)


# --------------------------------------------------------------------------
# window strategy
# --------------------------------------------------------------------------


def _window_keep(
    df: DataFrame, group_cols: list[str], id_col: str, weight_col: str, budget_expr
) -> DataFrame:
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col(_KEY), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(F.col(weight_col).cast("long")).over(w), F.lit(0))
    return (
        df.withColumn("_rs_prev", prev)
        .where(F.col("_rs_prev") < budget_expr)
        .drop("_rs_prev")
    )


# --------------------------------------------------------------------------
# threshold strategy (scale path)
# --------------------------------------------------------------------------


def _threshold_keep(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    n_buckets: int = N_KEY_BUCKETS,
    frac: float | None = None,
) -> DataFrame:
    # bucket = high bits of the key mapped to [0, n_buckets); preserves key
    # order because int64→double, scale, and floor are all monotone
    kb = ((F.col(_KEY).cast("double") / F.lit(float(2**64)) + F.lit(0.5)) * n_buckets).cast(
        "int"
    )
    df = df.withColumn("_rs_kb", F.least(F.greatest(kb, F.lit(0)), F.lit(n_buckets - 1)))

    # phase 1: per-(group, bucket) weight totals — partial-aggregated map-side
    if frac is None:
        hist = df.groupBy(*group_cols, "_rs_kb").agg(
            F.sum(F.col(weight_col).cast("long")).alias("_rs_w"),
            F.first("_rs_budget").alias("_rs_budget"),
        )
    else:
        # frac mode (r7 continuation): the per-group row count IS the sum
        # of this histogram's weights (weight ≡ 1/row), so k is derived
        # from a window total over the TINY hist table instead of a
        # separate full count aggregate + broadcast join of the raw table
        # (which re-ran inside both hist and persist lineages — one extra
        # parquet scan). Same expression, same long n → bit-identical k:
        # floor(f64(frac)·n + 0.5), the reference's reads.rs:529 rounding.
        hist = df.groupBy(*group_cols, "_rs_kb").agg(
            F.sum(F.col(weight_col).cast("long")).alias("_rs_w"),
        )
        tot = (
            Window.partitionBy(*[F.col(c) for c in group_cols])
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        hist = hist.withColumn(
            "_rs_budget",
            F.floor(F.lit(frac) * F.sum("_rs_w").over(tot) + F.lit(0.5)).cast(
                "long"
            ),
        )
    wspec = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("_rs_kb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn("_rs_cum_prev", F.coalesce(F.sum("_rs_w").over(wspec), F.lit(0)))
    # verdicts: keep-all / drop-all / boundary (needs row-level refinement)
    hist = hist.withColumn(
        "_rs_verdict",
        F.when(F.col("_rs_cum_prev") >= F.col("_rs_budget"), F.lit("drop"))
        .when(
            F.col("_rs_cum_prev") + F.col("_rs_w") <= F.col("_rs_budget"), F.lit("keep")
        )
        .otherwise(F.lit("boundary")),
    ).withColumn("_rs_residual", F.col("_rs_budget") - F.col("_rs_cum_prev"))

    # One scan + one histogram join produce the non-dropped rows (≈ the
    # output size — budget-bounded), persisted so the two consumers below
    # share a single materialization instead of re-deriving the parquet
    # scan + histogram lineage. The exact running-sum window then runs
    # ONLY over the boundary buckets — ~1/n_buckets of each group — so the
    # full-group sort that dominated the naive plan disappears entirely.
    # NO static broadcast hint on the histogram: at few groups AQE converts
    # this to a runtime BroadcastHashJoin for free (verified in PLANS.md);
    # at 10⁵+ groups the (groups × n_buckets) histogram exceeds any sane
    # broadcast budget and the hinted plan would OOM the driver — the
    # runtime-stats decision is the guard (VERDICT r1 weak #7).
    joined = (
        df.join(
            hist.select(*group_cols, "_rs_kb", "_rs_verdict", "_rs_residual"),
            on=[*group_cols, "_rs_kb"],
            how="inner",
        )
        .where(F.col("_rs_verdict") != "drop")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _THRESHOLD_CACHES.append(joined)
    kept_whole = joined.where(F.col("_rs_verdict") == "keep")
    boundary = joined.where(F.col("_rs_verdict") == "boundary")
    bw = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col(_KEY), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(F.col(weight_col).cast("long")).over(bw), F.lit(0))
    kept_boundary = (
        boundary.withColumn("_rs_prev", prev)
        .where(F.col("_rs_prev") < F.col("_rs_residual"))
        .drop("_rs_prev")
    )
    drop = ["_rs_kb", "_rs_verdict", "_rs_residual"]
    return kept_whole.drop(*drop).unionByName(kept_boundary.drop(*drop))


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def downsample(
    df: DataFrame,
    *,
    seed: int,
    group_cols: tuple[str, ...] | list[str] = ("source",),
    mode: str,
    bases: int | None = None,
    coverage: float | None = None,
    genome_size: int | None = None,
    num: int | None = None,
    frac: float | None = None,
    id_col: str = "doc_id",
    order_col: str = "row_idx",
    weight_col: str = "n_tok",
    strategy: str = "threshold",
    derive_group_seeds: bool = True,
    key_expr=None,
    probability: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """Retain a random subset of ``df`` per group, per the given mode.

    Returns the retained rows with all original columns. Deterministic in
    (seed, group values, row identity) — never in partition layout, so the
    result is identical at any executor count (SURVEY §2.11).

    ``probability`` is the reference's ``-p`` shorthand (reads.rs:202-207):
    it rewrites to one-pass + frac. ``strict`` enables the reference's
    strict-mode validations (reads.rs:473-491, 543-549): error when the
    requested bases/num/frac exceed what the input holds (one extra
    aggregate over the group stats — driver-side assertion).
    """
    group_cols = list(group_cols)
    original_cols = df.columns

    if probability is not None:
        mode, frac = "one_pass", probability

    if strict and mode in ("bases", "num", "frac"):
        _strict_checks(df, group_cols, mode, bases, coverage, genome_size, num, frac)

    if mode == "one_pass":
        if frac is None:
            raise ValueError("one_pass needs frac=")
        df = _with_group_seed(df, group_cols, seed, derive_group_seeds)
        return _one_pass(df, frac, order_col).select(*original_cols)

    if mode == "bases":
        budget = resolve_budget(bases, coverage, genome_size)
        mode_budget = float(budget)
    elif mode == "num":
        if num is None:
            raise ValueError("num mode needs num=")
        mode_budget = float(num)
    elif mode == "frac":
        if frac is None:
            raise ValueError("frac mode needs frac=")
        mode_budget = float(sampler.normalize_fraction(frac))
    else:
        raise ValueError(f"unknown mode {mode!r}")

    if strategy == "exact":
        df = _with_group_seed(df, group_cols, seed, derive_group_seeds)
        kept_keys = _exact_select(
            df, group_cols, order_col, weight_col, mode, mode_budget
        )
        return df.join(kept_keys, on=[*group_cols, order_col], how="left_semi").select(
            *original_cols
        )

    # key-ordered strategies: frac needs per-group counts to become a k
    df = _with_key(
        df, id_col, key_expr, seed=seed,
        group_cols=group_cols if derive_group_seeds else [],
    )
    if mode == "frac":
        weight_expr = "_rs_one"
        df = df.withColumn(weight_expr, F.lit(1))
        if strategy == "threshold":
            # k is derived inside the threshold histogram (same
            # floor(f64(frac)·n + 0.5) on the same long n — bit-identical;
            # see _threshold_keep): no separate count pass, no broadcast
            # join of the raw table (r7 continuation).
            out = _threshold_keep(
                df, group_cols, id_col, weight_expr, frac=mode_budget
            )
            return out.select(*original_cols)
        counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_rs_n"))
        # round-half-away-from-zero on f64(frac)*n (reads.rs:529)
        kcol = F.floor(F.lit(mode_budget) * F.col("_rs_n") + F.lit(0.5)).cast("long")
        df = df.join(
            F.broadcast(counts.withColumn("_rs_budget", kcol).drop("_rs_n")),
            on=group_cols,
            how="inner",
        )
    elif mode == "num":
        df = df.withColumn("_rs_budget", F.lit(int(mode_budget)))
        weight_expr = "_rs_one"
        df = df.withColumn(weight_expr, F.lit(1))
    else:  # bases
        df = df.withColumn("_rs_budget", F.lit(int(mode_budget)))
        weight_expr = weight_col

    if strategy == "window":
        out = _window_keep(df, group_cols, id_col, weight_expr, F.col("_rs_budget"))
    elif strategy == "threshold":
        out = _threshold_keep(df, group_cols, id_col, weight_expr)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return out.select(*original_cols)


def _strict_checks(
    df: DataFrame,
    group_cols: list[str],
    mode: str,
    bases,
    coverage,
    genome_size,
    num,
    frac,
) -> None:
    """Strict-mode validations per group (reads.rs:473-491, 543-549)."""
    stats = df.groupBy(*group_cols).agg(
        F.sum(F.col("n_tok").cast("long")).alias("_tot"),
        F.count(F.lit(1)).alias("_n"),
    )
    if mode == "bases":
        budget = resolve_budget(bases, coverage, genome_size)
        bad = stats.where(F.col("_tot") < budget).limit(1).collect()
        if bad:
            g = bad[0]
            raise sampler.StrictModeError(
                f"Requested number of bases ({budget}) is more than the input "
                f"({g._tot}) for group {tuple(g[c] for c in group_cols)}"
            )
    elif mode == "num":
        bad = stats.where(F.col("_n") < int(num)).limit(1).collect()
        if bad:
            g = bad[0]
            raise sampler.StrictModeError(
                f"Requested number of reads ({num}) is more than the input "
                f"({g._n}) for group {tuple(g[c] for c in group_cols)}"
            )
    elif mode == "frac":
        f32 = sampler.normalize_fraction(frac)
        bad = stats.where(
            F.floor(F.lit(f32) * F.col("_n") + F.lit(0.5)) == 0
        ).limit(1).collect()
        if bad:
            g = bad[0]
            raise sampler.StrictModeError(
                f"Requested fraction of reads ({frac} * {g._n}) was rounded to 0 "
                f"for group {tuple(g[c] for c in group_cols)}"
            )


def realized_coverage_report(
    df_out: DataFrame, genome_size: int, requested_coverage: float | None = None
) -> tuple[float, bool]:
    """C10 (reads.rs:632-647): realized coverage = kept tokens / genome size;
    returns (coverage, met_request)."""
    total = df_out.agg(F.sum(F.col("n_tok").cast("long"))).collect()[0][0] or 0
    cov = total / float(genome_size)
    met = requested_coverage is None or np.float32(cov) >= np.float32(requested_coverage)
    return cov, met


def _one_pass(df: DataFrame, frac: float, order_col: str) -> DataFrame:
    """Vectorized one-pass Bernoulli: row i kept ⟺ the i-th sequential
    ``random_bool(frac)`` draw of Pcg64(group seed) — computed independently
    per row via LCG jump-ahead (no scan, no shuffle; fastx.rs:127-160)."""
    frac = sampler.normalize_fraction(frac)

    @F.pandas_udf("boolean")
    def keep(gseed: pd.Series, ordinal: pd.Series) -> pd.Series:
        batch = pd.DataFrame(
            {"s": gseed.to_numpy(), "i": ordinal.to_numpy(dtype=np.int64)}
        )
        out = np.zeros(len(batch), dtype=bool)
        for s, grp in batch.groupby("s"):
            out[grp.index.to_numpy()] = pcg64_bernoulli_keys(
                int(s) & MASK64, grp["i"].to_numpy(np.uint64), frac
            )
        return pd.Series(out)

    return df.where(keep(F.col(_GSEED), F.col(order_col)))


def one_pass_hash(
    df: DataFrame,
    *,
    seed: int,
    frac: float,
    group_cols: tuple[str, ...] | list[str] = ("source",),
    id_col: str = "doc_id",
    derive_group_seeds: bool = True,
    key_expr=None,
) -> DataFrame:
    """Order-free Bernoulli thinning keyed on row identity — the scale-native
    variant when no stable ordinal exists: keep ⟺ hash(group seed, id)
    lands in the lowest frac of the key space. Pure JVM column ops."""
    frac = sampler.normalize_fraction(frac)
    original = df.columns
    df = _with_key(
        df, id_col, key_expr, seed=seed,
        group_cols=list(group_cols) if derive_group_seeds else [],
    )
    # signed key → uniform [0,1)
    u = F.col(_KEY).cast("double") / F.lit(float(2**64)) + F.lit(0.5)
    return df.where(u < F.lit(frac)).select(*original)


def selection_metrics(
    df_in: DataFrame, df_out: DataFrame, group_cols: tuple[str, ...] | list[str]
) -> DataFrame:
    """Per-group OnePassStats analog (fastx.rs:241-256) + realized budget
    report (reads.rs:632-647): rows seen/kept, n_tok seen/kept, realized
    fraction."""
    group_cols = list(group_cols)

    def agg(d: DataFrame, prefix: str) -> DataFrame:
        return d.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias(f"{prefix}_rows"),
            F.sum(F.col("n_tok").cast("long")).alias(f"{prefix}_n_tok"),
        )

    seen, kept = agg(df_in, "seen"), agg(df_out, "kept")
    return (
        seen.join(kept, on=group_cols, how="left")
        .na.fill(0, ["kept_rows", "kept_n_tok"])
        .withColumn(
            "realized_frac",
            F.when(F.col("seen_rows") > 0, F.col("kept_rows") / F.col("seen_rows")),
        )
    )
