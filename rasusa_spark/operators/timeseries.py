"""Timeseries operators beyond plain rollup: as-of join, LOCF/linear
gap-fill, and exact quantile rollups — the TimescaleDB/kdb-style surface a
tiered metric store needs (north_rule §2.5 extension; the reference has no
timeseries layer, these extend the engine's tier story the same way the
dedup stack extends SURVEY §2.12).

Scale shapes:

- ``asof_join`` is the classic operator Spark lacks natively. The naive
  range join (l.ts >= r.ts, max per left row) is O(|L|·|R|) per group;
  this implementation is the UNION-AND-CARRY form: tag both streams,
  shuffle ONCE on the group key, sort within partitions by (ts, tag), and
  carry the latest right-side values forward with
  ``last(ignorenulls=True)`` over an unbounded-preceding window. Cost is
  one shuffle + one in-partition sort over |L|+|R| rows — the same shape
  at 100 TB, with no join blowup possible.
- ``gap_fill_locf`` extends rollup.gap_fill's zero-fill with the
  TimescaleDB ``locf()`` (last-observation-carried-forward) and
  ``interpolate()`` (linear between surrounding observations) semantics,
  as pure window functions over the already-small aggregate table.
- ``rollup_quantiles`` uses Spark's exact ``percentile`` (interpolated,
  type-7 — same definition as DuckDB's ``quantile_cont``), map-side
  partial-aggregated like every other rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = ("source",),
    right_ts: str | None = None,
    value_cols: tuple[str, ...] | list[str] = ("n_tok_sum",),
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the matching right row within the same
    ``by`` group (DuckDB's ``ASOF JOIN``, kdb's ``aj``, pandas
    ``merge_asof`` — including its ``direction`` parameter):

    - ``'backward'`` (default): LATEST right row with ``right.ts <= left.ts``
    - ``'forward'``: EARLIEST right row with ``right.ts >= left.ts``
    - ``'nearest'``: whichever of the two is closer in time (tie → the
      backward match, i.e. the earlier right row)

    Returns all left columns plus each of ``value_cols`` and ``asof_ts``
    (the matched right timestamp; null when no right row qualifies, or
    when it is further than ``tolerance`` — an INTERVAL string like
    ``'2 hours'`` — from the left timestamp).

    A right row AT the left timestamp matches in every direction: at equal
    ts the right row sorts before the left row in the carry order.

    Both directions are the same union-and-carry plan — ONE shuffle on the
    group key; ``'nearest'`` adds a second in-partition sort (descending
    carry) over the same exchange, never a second shuffle.
    """
    by = list(by)
    direction_opts = ("backward", "forward", "nearest")
    if direction not in direction_opts:
        raise ValueError(
            f"unknown direction {direction!r}; use one of {direction_opts}"
        )
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        # ADVICE r3: a value_col that also exists on the left would be
        # carried from the LEFT row itself (the union keeps the left value
        # and last(ignorenulls) returns it as the "matched right value")
        # and the final select would emit a duplicate column name.
        raise ValueError(
            f"value_cols {sorted(overlap)} collide with left columns; "
            "rename the right-side value columns before the asof join"
        )
    rts = right_ts or on
    l_tag = left.withColumn("_r", F.lit(1))
    r_tag = right.select(
        *by,
        F.col(rts).alias(on),
        *[F.col(c) for c in value_cols],
    ).withColumn("_r", F.lit(0))

    # outer-union the two streams with each other's columns nulled
    left_cols = [c for c in left.columns]
    all_cols = left_cols + [c for c in value_cols if c not in left_cols]
    u = l_tag.select(
        *[
            F.col(c) if c in l_tag.columns else F.lit(None).alias(c)
            for c in all_cols
        ],
        F.lit(None).cast("timestamp").alias("_asof_ts"),
        "_r",
    ).unionByName(
        r_tag.select(
            *[
                F.col(c) if c in r_tag.columns else F.lit(None).alias(c)
                for c in all_cols
            ],
            F.col(on).alias("_asof_ts"),
            "_r",
        )
    )

    # backward carry: ascending ts, right rows (_r=0) before left at ties;
    # forward carry: DESCENDING ts, right rows still first at ties — the
    # exact mirror, sharing the one exchange on the group key.
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(w, suffix: str):
        return [
            F.last("_asof_ts", ignorenulls=True).over(w).alias(f"asof_ts{suffix}")
        ] + [
            F.last(c, ignorenulls=True).over(w).alias(f"_c{suffix}_{c}")
            for c in value_cols
        ]

    def gate(ts_col, suffix: str, cond):
        """Null out a side's match outside the tolerance window."""
        return [F.when(cond, ts_col).alias(f"asof_ts{suffix}")] + [
            F.when(cond, F.col(f"_c{suffix}_{c}")).alias(f"_c{suffix}_{c}")
            for c in value_cols
        ]

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        carried = u.select(*left_cols, "_r", *carry(w, "")).where(
            F.col("_r") == 1
        )
        if tolerance is not None:
            delta = F.expr(f"interval {tolerance}")
            in_window = (
                F.col("asof_ts") >= F.col(on) - delta
                if direction == "backward"
                else F.col("asof_ts") <= F.col(on) + delta
            )
            carried = carried.select(
                *left_cols, *gate(F.col("asof_ts"), "", in_window)
            )
        return carried.select(
            *left_cols,
            "asof_ts",
            *[F.col(f"_c_{c}").alias(c) for c in value_cols],
        )

    # nearest: both carries over the same exchange, then pick the closer
    # side per row (tie → backward, the earlier right row).
    carried = u.select(
        *left_cols, "_r", *carry(w_back, "_b"), *carry(w_fwd, "_f")
    ).where(F.col("_r") == 1)
    if tolerance is not None:
        delta = F.expr(f"interval {tolerance}")
        carried = carried.select(
            *left_cols,
            *gate(F.col("asof_ts_b"), "_b", F.col("asof_ts_b") >= F.col(on) - delta),
            *gate(F.col("asof_ts_f"), "_f", F.col("asof_ts_f") <= F.col(on) + delta),
        )
    back_dist = F.unix_timestamp(F.col(on)) - F.unix_timestamp("asof_ts_b")
    fwd_dist = F.unix_timestamp("asof_ts_f") - F.unix_timestamp(F.col(on))
    use_back = F.col("asof_ts_f").isNull() | (
        F.col("asof_ts_b").isNotNull() & (back_dist <= fwd_dist)
    )
    return carried.select(
        *left_cols,
        F.when(use_back, F.col("asof_ts_b"))
        .otherwise(F.col("asof_ts_f"))
        .alias("asof_ts"),
        *[
            F.when(use_back, F.col(f"_c_b_{c}"))
            .otherwise(F.col(f"_c_f_{c}"))
            .alias(c)
            for c in value_cols
        ],
    )


def asof_join_skinny(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = ("source",),
    right_ts: str | None = None,
    value_cols: tuple[str, ...] | list[str] = ("n_tok_sum",),
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """``asof_join`` for WIDE left rows (the 100-TB training-sequence
    shape: a left row carries a multi-KB token array). The plain
    union-and-carry sorts every left column through the window — fine for
    skinny rows, but at scale the in-partition sort buffers hold the wide
    payloads. This variant carries only (by, ts, ``left_key``) through the
    union/sort, then equi-joins the wide left columns back on the unique
    ``left_key`` afterwards: the sort touches O(|L|+|R|) skinny rows, and
    the payload bytes move through exactly ONE hash shuffle (the re-join),
    never a sort.

    Same semantics/result as ``asof_join`` for every ``direction`` /
    ``tolerance`` (pinned by the equality pytest); requires ``left_key``
    to be unique per left row."""
    if left_key not in left.columns:
        raise ValueError(f"left_key {left_key!r} not in left columns")
    skinny = left.select(left_key, *by, on)
    matched = asof_join(
        skinny,
        right,
        on=on,
        by=by,
        right_ts=right_ts,
        value_cols=value_cols,
        tolerance=tolerance,
        direction=direction,
    ).select(left_key, "asof_ts", *value_cols)
    return left.join(matched, on=left_key)


def gap_fill_locf(
    filled: DataFrame,
    *,
    group_cols: tuple[str, ...] | list[str] = ("source",),
    value_col: str = "n_tok_sum",
    method: str = "locf",
) -> DataFrame:
    """Fill the GAP rows of a gap-filled aggregate (rollup.gap_fill output,
    ``gap_filled = true`` marks spine-only buckets) for one metric column:

    - ``method='locf'``: last observation carried forward (TimescaleDB
      ``locf()``); leading gaps (no prior observation) stay null.
    - ``method='linear'``: linear interpolation between the surrounding
      observations (TimescaleDB ``interpolate()``); gaps before the first
      or after the last observation stay null.

    Adds ``{value_col}_filled`` (double for linear, original type for
    locf); observed rows pass their value through unchanged. Window-only —
    one shuffle on the group key over the already-aggregated table.
    """
    group_cols = list(group_cols)
    obs = F.when(~F.col("gap_filled"), F.col(value_col))
    wp = Window.partitionBy(*group_cols).orderBy("bucket_start")
    prev_w = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_w = wp.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out_col = f"{value_col}_filled"
    if method == "locf":
        return filled.withColumn(
            out_col, F.last(obs, ignorenulls=True).over(prev_w)
        )
    if method != "linear":
        raise ValueError(f"unknown fill method {method!r}; use locf|linear")
    obs_ts = F.when(~F.col("gap_filled"), F.col("bucket_start"))
    prev_v = F.last(obs, ignorenulls=True).over(prev_w)
    next_v = F.first(obs, ignorenulls=True).over(next_w)
    prev_t = F.last(obs_ts, ignorenulls=True).over(prev_w)
    next_t = F.first(obs_ts, ignorenulls=True).over(next_w)
    span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    frac = F.when(
        span > 0,
        (F.unix_timestamp("bucket_start") - F.unix_timestamp(prev_t)) / span,
    ).otherwise(F.lit(0.0))
    interp = prev_v.cast("double") + frac * (
        next_v.cast("double") - prev_v.cast("double")
    )
    return filled.withColumn(
        out_col,
        F.when(~F.col("gap_filled"), F.col(value_col).cast("double")).otherwise(
            F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        ),
    )


def rollup_quantiles(
    df: DataFrame,
    tier: str,
    *,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] | list[str] = ("source",),
    value_col: str = "n_tok",
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-bucket exact quantiles of ``value_col`` (interpolated, type-7 —
    Spark ``percentile`` == DuckDB ``quantile_cont``), one column per
    requested probability (``p50``/``p90``/... naming). Same shuffle as
    every rollup: one groupBy on (group, bucket); for sketched quantiles
    at extreme cardinalities swap ``percentile`` for
    ``percentile_approx`` — identical plan shape."""
    from .rollup import bucket_expr

    def name(p: float) -> str:
        s = f"{p * 100:g}".replace(".", "_")
        return f"p{s}"

    return df.groupBy(
        *group_cols, bucket_expr(tier, ts_col).alias("bucket_start")
    ).agg(
        *[
            F.round(F.expr(f"percentile({value_col}, {p})"), 6).alias(name(p))
            for p in probs
        ],
        F.count(F.lit(1)).alias("row_count"),
    )
