"""Domain-mixture resampling — the data-mixing step of an LLM training-data
pipeline (public recipes: The Pile's per-set weights, Gao et al. 2020;
DoReMi domain reweighting, Xie et al. 2023, arXiv:2305.10429).

``mix_corpus`` re-weights a corpus to a target domain mixture under a
global token budget: each domain keeps the deterministic hash-ordered
prefix of its documents whose cumulative token count reaches the domain's
share (``weight_d / Σweights × total_tokens``). Domains absent from the
weight table are dropped; a domain with fewer tokens than its share keeps
everything (the realized mixture then under-fills — surfaced by
``mix_summary``, never silently rebalanced).

Spark-first shape: ONE broadcast join against the tiny (domain, budget)
dim plus the engine's two-phase threshold-selection kernel
(operators/downsample.py::_threshold_keep — per-(group, key-bucket)
histogram, exact running-sum window ONLY over boundary buckets). No
global or per-domain sort, no skew sensitivity to a hot domain, identical
output at any executor count (keys are f(seed, domain, id) — SURVEY
§2.11). Reference analog: the per-group byte-budget sampler contract
(src/subsample.rs budget crossing: keep while the PREVIOUS cumulative
weight is under budget), applied per mixture domain instead of per file.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .downsample import _threshold_keep, _with_key


def mixture_budgets(
    weights: dict[str, float], total_tokens: int
) -> dict[str, int]:
    """Per-domain integer token budgets: normalized weight × total, rounded
    half-away-from-zero (the engine's frac→k contract — Python ``round``
    is banker's and would disagree with the reference arithmetic)."""
    if total_tokens <= 0:
        raise ValueError("total_tokens must be positive")
    bad = {d: w for d, w in weights.items() if not w > 0}
    if bad:
        raise ValueError(f"weights must be positive, got {bad}")
    s = float(sum(weights.values()))
    return {
        d: int(math.floor(w / s * total_tokens + 0.5))
        for d, w in weights.items()
    }


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    *,
    seed: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    weight_col: str = "n_tok",
    key_expr=None,
) -> DataFrame:
    """Retain a deterministic per-domain subset matching the target
    mixture. Returns retained rows with all original columns.

    The per-domain selection is the threshold strategy's budget-crossing
    contract: documents ordered by the uniform key (xxhash64 of
    (seed, domain, id), or ``key_expr`` for oracle cross-checks) are kept
    while the cumulative ``weight_col`` BEFORE the row is under the
    domain's budget — so each domain overshoots its share by less than
    one document, and the kept set is a pure function of
    (seed, domain, id), never of partition layout."""
    budgets = mixture_budgets(weights, total_tokens)
    original_cols = df.columns
    dim = df.sparkSession.createDataFrame(
        sorted(budgets.items()), f"{domain_col} string, _rs_budget long"
    )
    keyed = _with_key(
        df, id_col, key_expr, seed=seed, group_cols=[domain_col]
    ).join(F.broadcast(dim), on=domain_col, how="inner")
    return _threshold_keep(keyed, [domain_col], id_col, weight_col).select(
        *original_cols
    )


def mix_summary(
    kept: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    *,
    domain_col: str = "domain",
    weight_col: str = "n_tok",
) -> DataFrame:
    """Realized-vs-target mixture report (one aggregate over the kept
    set): per domain the kept token count, the budget, and the realized
    share — the operator's analog of the downsampler's realized-coverage
    report. Under-filled domains (corpus smaller than the share) show
    kept_tokens < budget here instead of being silently rebalanced."""
    budgets = mixture_budgets(weights, total_tokens)
    dim = kept.sparkSession.createDataFrame(
        sorted(budgets.items()), f"{domain_col} string, budget long"
    )
    agg = kept.groupBy(domain_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("kept_tokens"),
        F.count(F.lit(1)).alias("kept_docs"),
    )
    total = F.sum("kept_tokens").over(Window.partitionBy())
    return (
        dim.join(agg, on=domain_col, how="left")
        .fillna(0, subset=["kept_tokens", "kept_docs"])
        .withColumn(
            "realized_share",
            F.round(F.col("kept_tokens") / F.greatest(total, F.lit(1)), 6),
        )
    )
