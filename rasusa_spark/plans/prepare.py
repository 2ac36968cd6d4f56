"""Composed training-data preparation pipeline — the end-to-end path a
100-TB corpus takes through the engine's LLM-pipeline operators, in the
order a production pipeline runs them (cheapest filters first, so each
stage shrinks the data the next one shuffles):

  1. exact dedup        (hash groupBy — one shuffle, map-side combined)
  2. quality filter     (pure column exprs — fuses into the scan)
  3. repetition filter  (Gopher-style dup-line / dup-bigram caps)
  4. decontamination    (broadcast probe shingles, map-side semi-join)
  5. near-dup clustering (prefix-filtered jaccard pairs → connected
     components → keep the cluster minimum)
  6. per-source token-budget downsample (optional — the rasusa operator)

Each stage is one of the engine's tested operators; this module only
composes them. Stage order matters at scale: exact dedup and the scalar
filters drop the bulk of junk before the shingle-join stages pay their
shuffles, and the budget sampler runs last so budgets apply to the clean
corpus.

No reference analog (rasusa is the stage-6 sampler only — reads.rs); the
surrounding stages are the standard LLM data pipeline (Gopher §A1,
RefinedWeb §3, CCNet) re-expressed on this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _DEDUP_CACHES,
    dedup_clusters,
    dedup_exact,
    ngram_contamination,
    ngram_jaccard_pairs,
)
from ..operators.downsample import downsample
from ..operators.text import quality_features, repetition_features


def prepare_training_data(
    docs: DataFrame,
    *,
    seed: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_min_score: float | None = 0.2,
    max_dup_line_frac: float | None = 0.5,
    max_top_2gram_frac: float | None = 0.5,
    probes: DataFrame | None = None,
    contamination_min_shared: int = 2,
    jaccard_threshold: float | None = 0.6,
    shingle_n: int = 3,
    budget_tokens: int | None = None,
    group_cols: tuple[str, ...] = ("source",),
    weight_col: str = "n_tok",
) -> DataFrame:
    """Run the full prep pipeline and return the retained documents with
    their original columns. Every stage is optional (pass ``None`` to skip);
    defaults give a conservative pipeline that only needs (id, text).

    ``budget_tokens`` enables the stage-6 rasusa sampler and requires
    ``weight_col`` (token counts) and ``group_cols`` on the input.
    Deterministic in (seed, ids) — never partition layout."""
    out = docs

    # 1. exact dedup
    out = dedup_exact(out, text_col=text_col, id_col=id_col)

    # 2. quality filter (score from length/punct/stopword ratios)
    if quality_min_score is not None:
        scored = quality_features(out, text_col=text_col)
        out = scored.where(F.col("q_score") >= quality_min_score).select(
            *docs.columns
        )

    # 3. repetition caps
    if max_dup_line_frac is not None or max_top_2gram_frac is not None:
        rep = repetition_features(out, text_col=text_col, id_col=id_col)
        keep = F.lit(True)
        if max_dup_line_frac is not None:
            keep = keep & (F.col("dup_line_frac") <= max_dup_line_frac)
        if max_top_2gram_frac is not None:
            keep = keep & (F.col("top_2gram_frac") <= max_top_2gram_frac)
        out = out.join(
            rep.where(keep).select(id_col), on=id_col, how="left_semi"
        )

    # 4. decontamination vs a benchmark probe set
    if probes is not None:
        flagged = ngram_contamination(
            out,
            probes,
            n=shingle_n,
            min_shared=contamination_min_shared,
            text_col=text_col,
            id_col=id_col,
        ).select(id_col)
        out = out.join(flagged, on=id_col, how="left_anti")

    # 5. near-dup clustering → keep one doc per cluster (the component min).
    # The stage consumes `out` three times (pair generation, cluster join,
    # survivor semi-join) — persist the filtered set so the upstream scan +
    # filter stages run once, not three times (at 100 TB the input scan is
    # the dominant cost; production pipelines would checkpoint to storage
    # here, which a caller can do instead by materializing `out` itself).
    if jaccard_threshold is not None:
        out = out.persist()
        # registered for release_dedup_caches() like every other dedup-path
        # persist — long-lived sessions reclaim the blocks once results are
        # materialized (ADVICE r2)
        _DEDUP_CACHES.append(out)
        pairs = ngram_jaccard_pairs(
            out, n=shingle_n, threshold=jaccard_threshold,
            text_col=text_col, id_col=id_col,
        ).select("id_a", "id_b")
        clusters = dedup_clusters(out, pairs, id_col=id_col)
        canonical = clusters.where(F.col("cluster_id") == F.col(id_col)).select(
            id_col
        )
        out = out.join(canonical, on=id_col, how="left_semi")

    # 6. per-group token-budget downsample (rasusa semantics)
    if budget_tokens is not None:
        out = downsample(
            out,
            seed=seed,
            group_cols=group_cols,
            mode="bases",
            bases=budget_tokens,
            id_col=id_col,
            weight_col=weight_col,
            strategy="threshold",
        )

    return out
