"""Mergeable distinct-count tier for the continuous-aggregate cascade
(north_rule §2.5 extension: "distinct users per bucket" is the canonical
non-algebraic rollup metric — plain counts re-roll by addition, distinct
counts do NOT, so the tier cascade needs a mergeable carrier).

Two carriers, one contract (coarser tier == direct recomputation):

- **Exact**: the per-bucket *sorted distinct id array* IS the mergeable
  state — set union is associative/commutative/idempotent, so any re-roll
  path (raw→1h→1d vs raw→1d) lands on the identical set and identical
  count. This is the bit-equal tier used when per-bucket cardinality is
  bounded (the 100-TB caveat: state is O(distinct ids per bucket); fine
  for per-hour user sets, wrong for globally-unique ids — use HLL there).
- **HLL sketch** (Apache DataSketches via Spark's built-in
  ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``):
  fixed-size state, union is the merge — the carrier for unbounded
  cardinalities. Estimates from the 1h→1d union equal the direct 1d
  sketch's estimate because the register state only depends on the SET of
  hashed items, not grouping (pinned in pytest).

Both are single map-side-combinable groupBy aggregates — the same one
(group, bucket) shuffle as every other tier; the merge to a coarser tier
aggregates only the already-tiny finer aggregate table (O(delta) when fed
through streaming/incremental.py's merge pattern).

Reference anchor: the reference keeps per-file selection-summary stats
(src/summary.rs); the engine's tier story generalizes those to mergeable
per-bucket aggregates (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import bucket_expr


#: Per-bucket cardinality above which the exact carrier refuses to run
#: (VERDICT r4: the crossover to HLL was documented but unenforced — a
#: caller pointing the exact carrier at globally-unique ids built
#: multi-GB agg buffers instead of an error). 1M ids ≈ tens of MB per
#: bucket row — the practical ceiling for a state you still want to
#: shuffle and store. Pass ``max_set_size=None`` to opt out explicitly.
DEFAULT_MAX_SET_SIZE = 1_000_000


def _guarded_count(max_set_size: int | None):
    """n_distinct projection that enforces the exact-carrier cardinality
    contract INSIDE the plan (distributed, zero extra pass): buckets over
    the bound raise at execution time with a pointer to the HLL carrier."""
    size = F.size("id_set").cast("long")
    if max_set_size is None:
        return size
    return F.when(size <= max_set_size, size).otherwise(
        F.raise_error(
            F.format_string(
                "exact distinct-set carrier: bucket holds %s distinct ids "
                f"(> max_set_size={max_set_size}) — use the HLL carrier "
                "(hll_partials/hll_from_finer) for unbounded cardinality, "
                "or raise/disable max_set_size explicitly",
                size,
            )
        )
    )


def distinct_partials(
    df: DataFrame,
    tier: str,
    *,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] | list[str] = ("source",),
    id_col: str = "doc_id",
    max_set_size: int | None = DEFAULT_MAX_SET_SIZE,
) -> DataFrame:
    """Per-(group, bucket) exact distinct state: sorted distinct id array
    + its count. ``collect_set`` is map-side combinable (partial sets
    merge per partition before the shuffle); ``array_sort`` canonicalizes
    so the state is layout-invariant and comparable bit-for-bit.
    ``max_set_size`` enforces the bounded-cardinality contract (see
    ``DEFAULT_MAX_SET_SIZE``)."""
    return (
        df.groupBy(*group_cols, bucket_expr(tier, ts_col).alias("bucket_start"))
        .agg(F.array_sort(F.collect_set(id_col)).alias("id_set"))
        .withColumn("n_distinct", _guarded_count(max_set_size))
    )


def distinct_from_finer(
    finer: DataFrame,
    tier: str,
    *,
    group_cols: tuple[str, ...] | list[str] = ("source",),
    max_set_size: int | None = DEFAULT_MAX_SET_SIZE,
) -> DataFrame:
    """Re-roll the exact distinct state into a coarser tier: union of the
    finer buckets' sets (flatten + distinct + sort — associative and
    idempotent, so ANY split of the data across finer buckets or runs
    yields the identical coarser state; the O(delta) incremental-merge
    argument of streaming/incremental.py applies verbatim). The coarser
    union can exceed the bound even when every finer bucket was in-bound,
    so the ``max_set_size`` guard re-applies here."""
    return (
        finer.groupBy(
            *group_cols, bucket_expr(tier, "bucket_start").alias("bucket_start")
        )
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("id_set")))
            ).alias("id_set")
        )
        .withColumn("n_distinct", _guarded_count(max_set_size))
    )


def hll_partials(
    df: DataFrame,
    tier: str,
    *,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] | list[str] = ("source",),
    id_col: str = "doc_id",
    lg_k: int = 12,
) -> DataFrame:
    """Per-(group, bucket) HLL sketch state (DataSketches HllSketch,
    lgConfigK=``lg_k`` → 2^lg_k registers ≈ 1.5 KiB at the default) — the
    fixed-size carrier for unbounded per-bucket cardinalities."""
    return df.groupBy(
        *group_cols, bucket_expr(tier, ts_col).alias("bucket_start")
    ).agg(F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("hll"))


def hll_from_finer(
    finer: DataFrame,
    tier: str,
    *,
    group_cols: tuple[str, ...] | list[str] = ("source",),
) -> DataFrame:
    """Union the finer tier's sketches into the coarser tier
    (``hll_union_agg`` — register-wise max, associative)."""
    return finer.groupBy(
        *group_cols, bucket_expr(tier, "bucket_start").alias("bucket_start")
    ).agg(F.hll_union_agg("hll").alias("hll"))


def hll_estimates(partials: DataFrame) -> DataFrame:
    """Project the sketch column to its cardinality estimate."""
    return partials.withColumn(
        "n_distinct_est", F.hll_sketch_estimate("hll")
    ).drop("hll")
