"""Paired / template-grouped sampling (reference C6, C7, C9; SURVEY §2.3).

- ``one_pass_paired``   — two aligned tables (R1/R2) advance in lockstep:
  ONE shared Bernoulli draw per row index decides both mates
  (fastx.rs:172-236); a row-count mismatch errors (fastx.rs:48-56 /
  check_paired_counts, reads.rs:658-671).
- ``one_pass_templates`` — template-grouped streaming sampler
  (source.rs:136-222): consecutive rows sharing a template id form one
  logical unit; one draw per template, keyed on the template's ORDINAL
  (its first-seen position), keeps or drops every segment together.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import sampler
from ..rng import MASK64, pcg64_bernoulli_keys
from .downsample import _GSEED, _with_group_seed, downsample


def check_paired_counts(df1: DataFrame, df2: DataFrame) -> None:
    """reads.rs:658-671: both inputs must contain equal record counts."""
    n1, n2 = df1.count(), df2.count()
    sampler.check_paired_counts(n1, n2)


def _keep_udf(frac: float):
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

    return keep


def one_pass_paired(
    df_r1: DataFrame,
    df_r2: DataFrame,
    *,
    seed: int,
    frac: float,
    order_col: str = "row_idx",
    group_cols: tuple[str, ...] | list[str] = (),
    derive_group_seeds: bool = False,
    validate_counts: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Lockstep paired one-pass: the i-th template (R1[i], R2[i]) is kept iff
    the i-th sequential Bernoulli draw is true — mates never split. Returns
    (kept_r1, kept_r2). Exactly reproduces the reference's paired goldens
    (tests/reproducibility.rs:132-215) with derive_group_seeds=False."""
    if validate_counts:
        check_paired_counts(df_r1, df_r2)
    frac = sampler.normalize_fraction(frac)
    keep = _keep_udf(frac)

    def filt(df: DataFrame) -> DataFrame:
        original = df.columns
        d = _with_group_seed(df, list(group_cols), seed, derive_group_seeds)
        return d.where(keep(F.col(_GSEED), F.col(order_col))).select(*original)

    return filt(df_r1), filt(df_r2)


def one_pass_templates(
    df: DataFrame,
    *,
    seed: int,
    frac: float,
    template_col: str = "doc_id",
    order_col: str = "row_idx",
    group_cols: tuple[str, ...] | list[str] = (),
    derive_group_seeds: bool = False,
) -> DataFrame:
    """Template-grouped one-pass (C7): rows sharing ``template_col`` are one
    unit; the draw index is the template's ordinal by first appearance
    (TemplateGrouper.decide, source.rs:241-267 — unsegmented rows are
    singleton templates and consume one draw each)."""
    frac = sampler.normalize_fraction(frac)
    original = df.columns
    d = _with_group_seed(df, list(group_cols), seed, derive_group_seeds)
    gw = [F.col(c) for c in group_cols] if group_cols else [F.lit(0)]
    first_pos = F.min(order_col).over(
        Window.partitionBy(*gw, F.col(template_col))
    )
    d = d.withColumn("_tpl_first", first_pos)
    tpl_ord = (
        F.dense_rank().over(Window.partitionBy(*gw).orderBy("_tpl_first")) - 1
    )
    d = d.withColumn("_tpl_ord", tpl_ord)
    keep = _keep_udf(frac)
    return d.where(keep(F.col(_GSEED), F.col("_tpl_ord"))).select(*original)


def downsample_templates(
    df: DataFrame,
    *,
    seed: int,
    mode: str,
    group_cols: tuple[str, ...] | list[str] = (),
    bases: int | None = None,
    coverage: float | None = None,
    genome_size: int | None = None,
    num: int | None = None,
    frac: float | None = None,
    template_col: str = "doc_id",
    weight_col: str = "n_tok",
    strategy: str = "threshold",
    derive_group_seeds: bool = True,
    key_expr=None,
) -> DataFrame:
    """Two-pass TEMPLATE-budget sampler — the paired `reads -n/-c` analog
    (reads.rs:451-463: mate lengths are summed element-wise into one weight
    per template before selection; source.rs:304-335 groups segments).

    Pass 1 aggregates per-template weight = Σ segment weights (one map-side
    combinable shuffle producing ONE skinny row per template — the engine
    analog of the reference's lengths-only first pass). Selection then runs
    over the template table with the template id as the sampling unit
    (bases budget counts template weight; num counts templates; frac is a
    fraction of templates). Pass 2 left-semi-joins every segment of the
    surviving templates back, so mates can never split.

    Deterministic in (seed, group, template id) — cluster-size-invariant.
    Key-ordered strategies only ('window'/'threshold'); the bit-parity
    'exact' strategy needs a template ordinal, which two-pass paired inputs
    don't carry — use one_pass_paired / one_pass_templates for parity runs.
    """
    if strategy == "exact":
        raise ValueError(
            "downsample_templates supports key-ordered strategies "
            "('window'/'threshold'); use one_pass_templates for exact parity"
        )
    group_cols = list(group_cols)
    original = df.columns
    tpl = df.groupBy(*group_cols, template_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("_tpl_w")
    )
    kept_tpl = downsample(
        tpl,
        seed=seed,
        group_cols=group_cols,
        mode=mode,
        bases=bases,
        coverage=coverage,
        genome_size=genome_size,
        num=num,
        frac=frac,
        id_col=template_col,
        weight_col="_tpl_w",
        strategy=strategy,
        derive_group_seeds=derive_group_seeds,
        key_expr=key_expr,
    )
    return df.join(
        kept_tpl.select(*group_cols, template_col),
        on=[*group_cols, template_col],
        how="left_semi",
    ).select(*original)


# --- guards (P3, P6, P7) ----------------------------------------------------


class ValidationError(ValueError):
    pass


def assert_all_unmapped(df: DataFrame, mapped_col: str = "mapped") -> None:
    """P3 (source.rs:321-323): reject any mapped read in `reads` input."""
    n = df.where(F.col(mapped_col)).count()
    if n:
        raise ValidationError(f"{n} mapped records in unmapped-only input")


def check_name_grouped(
    df: DataFrame,
    template_col: str = "doc_id",
    order_col: str = "row_idx",
    probe: int = 50,
) -> None:
    """P6 (source.rs:57-116): within the first ``probe`` rows, a template id
    must not reappear after a different one (runs must be contiguous)."""
    rows = [
        r[0]
        for r in df.orderBy(order_col).select(template_col).limit(probe).collect()
    ]
    seen, prev = set(), None
    for name in rows:
        if name != prev and name in seen:
            raise ValidationError(
                f"input is not name-grouped: template {name!r} reappears"
            )
        seen.add(name)
        prev = name


def probe_pairedness(
    df: DataFrame, segment_col: str = "segment", order_col: str = "row_idx", probe: int = 10
) -> bool:
    """P7 (mod.rs:40-55): paired iff any of the first ``probe`` rows is
    segmented (has a 'last' mate)."""
    rows = df.orderBy(order_col).select(segment_col).limit(probe).collect()
    return any(r[0] == "last" for r in rows)
