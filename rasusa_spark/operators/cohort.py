"""User-behavior analytics over the event stream: cohort retention and
ordered funnel conversion — the two classic queries an event-analytics
engine (Amplitude/Mixpanel-style, all public semantics) answers on the
same (user, ts, event_type) table the sessionizer consumes (north_rule
§2.5/§2.6 extension; the reference's read-group accounting is the
degenerate single-step case, src/summary.rs).

Scale shapes:

- ``cohort_retention``: distinct (user, day) activity → per-user min day
  (ONE combinable groupBy) → offset counts (ONE groupBy on the skinny
  activity table joined to the per-user cohort dim). The join key is the
  user id — co-partitioned with the groupBy that produced it, and the
  cohort dim is |users|-sized (AQE broadcasts it at dim scale or
  shuffle-joins co-keyed at 100 TB). No self-join on the raw table.
- ``funnel``: k chained per-user conditional ``min`` aggregations, each a
  combinable groupBy over the step-filtered (skinny) event table with the
  previous step's per-user timestamp joined in — k is the funnel length
  (3-5), so the plan is k user-keyed shuffles over ever-shrinking tables,
  never a window over raw events and never a cross join.

Cross-engine: timestamps and day arithmetic are integer-exact
(``date_trunc``/``datediff``); the only float is the final conversion-rate
division, one IEEE op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention triangle: cohort = the day of a user's
    FIRST activity; for every (cohort_day, day_offset) count the distinct
    cohort users active ``offset`` days later, plus the cohort size and
    the retention rate (``n_users / cohort_size``, one IEEE division;
    offset 0 is 1.0 by construction).

    Deterministic and layout-invariant: every aggregate is min/countDistinct
    over exact values."""
    day = F.date_trunc("day", F.col(ts_col))
    active = df.select(F.col(user_col).alias("u"), day.alias("day")).distinct()
    first = active.groupBy("u").agg(F.min("day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.countDistinct("u").alias("cohort_size")
    )
    ret = (
        active.join(first, on="u")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("u").alias("n_users"))
    )
    return ret.join(sizes, on="cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_users",
        "cohort_size",
        (F.col("n_users").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention_rate"
        ),
    )


def cohort_retention_filled(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """``cohort_retention`` with the retention TRIANGLE gap-filled
    (VERDICT r4 Next #7): a (cohort_day, day_offset) cell with zero
    active users emits an explicit 0-row instead of vanishing, for every
    offset from 0 to the last observed day — i.e. exactly the lower
    triangle a retention chart draws.

    Spine = per-cohort ``sequence(0, datediff(last_day, cohort_day))``
    exploded — generated from the COHORT DIM (one row per cohort day),
    never from raw events; the global last day is a one-row broadcast.
    The left join fills ``n_users = 0`` and ``retention_rate = 0.0``;
    observed cells pass through bit-identical to ``cohort_retention``
    (pinned by test)."""
    ret = cohort_retention(df, user_col=user_col, ts_col=ts_col)
    sizes = ret.select("cohort_day", "cohort_size").distinct()
    last_day = df.select(
        F.max(F.date_trunc("day", F.col(ts_col))).alias("_last_day")
    )
    spine = (
        sizes.crossJoin(F.broadcast(last_day))
        .select(
            "cohort_day",
            "cohort_size",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.datediff(F.col("_last_day"), F.col("cohort_day")),
                )
            ).alias("day_offset"),
        )
    )
    return (
        spine.join(
            ret.select("cohort_day", "day_offset", "n_users"),
            on=["cohort_day", "day_offset"],
            how="left",
        )
        .select(
            "cohort_day",
            "day_offset",
            F.coalesce(F.col("n_users"), F.lit(0)).cast("long").alias("n_users"),
            "cohort_size",
        )
        .withColumn(
            "retention_rate",
            F.col("n_users").cast("double") / F.col("cohort_size").cast("double"),
        )
    )


def funnel(
    df: DataFrame,
    steps: list[str] | tuple[str, ...],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Ordered funnel conversion: how many users performed ``steps[0]``,
    then ``steps[1]`` STRICTLY AFTER it, then ``steps[2]`` strictly after
    that, … — each completion time being the EARLIEST possible one (the
    greedy/minimal parse, the standard funnel semantics: user's step-i
    time = min ts of a step-i event after their step-(i-1) time).

    ``within`` (an INTERVAL string like ``'7 days'``) additionally
    requires every later step to land within that horizon of the user's
    step-0 time.

    Returns one row per step: (step_idx, step, n_users,
    conversion_rate) with the rate relative to step 0 (one IEEE
    division). Ties at identical timestamps do NOT satisfy "strictly
    after" — pinned so the oracle's ``>`` comparisons match exactly."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("s"),
    ).where(F.col(type_col).isin(list(steps)))
    horizon = F.expr(f"interval {within}") if within is not None else None

    reached = ev.where(F.col("s") == steps[0]).groupBy("u").agg(
        F.min("t").alias("t0")
    )
    per_step = [reached.select("u", F.col("t0").alias("t_prev"), "t0")]
    for step in steps[1:]:
        prev = per_step[-1]
        nxt = (
            ev.where(F.col("s") == step)
            .join(prev, on="u")
            .where(F.col("t") > F.col("t_prev"))
        )
        if horizon is not None:
            nxt = nxt.where(F.col("t") <= F.col("t0") + horizon)
        per_step.append(
            nxt.groupBy("u", "t0").agg(F.min("t").alias("t_prev")).select(
                "u", "t_prev", "t0"
            )
        )
    from pyspark.sql import Window

    tagged = None
    for i, p in enumerate(per_step):
        t = p.select(
            F.lit(i).alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            "u",
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    counts = tagged.groupBy("step_idx", "step").agg(
        F.countDistinct("u").alias("n_users")
    )
    # anchor every step so a zero-conversion step emits n_users = 0
    # instead of vanishing (k literal rows, driver-side by design)
    dim = df.sparkSession.createDataFrame(
        [(i, s) for i, s in enumerate(steps)], "step_idx int, step string"
    )
    full = dim.join(counts, on=["step_idx", "step"], how="left").withColumn(
        "n_users", F.coalesce(F.col("n_users"), F.lit(0)).cast("long")
    )
    base = F.max(F.when(F.col("step_idx") == 0, F.col("n_users"))).over(
        Window.partitionBy()
    )
    return full.select(
        "step_idx",
        "step",
        "n_users",
        F.when(
            base > 0, F.col("n_users").cast("double") / base.cast("double")
        ).alias("conversion_rate"),
    )


def event_transitions(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Next-event transition matrix (path / Sankey analysis): for every
    consecutive pair of events per user — ordered by (ts, id), ties broken
    by the unique id identically in SQL — count (from_type, to_type)
    occurrences and the transition probability out of ``from_type``
    (one IEEE division against the integer out-degree).

    Scale shape: ONE user-keyed window (shuffle + in-partition sort) to
    form pairs, then ONE combinable groupBy on the (from, to) pair —
    the transition table is |types|² rows no matter the input size."""
    from pyspark.sql import Window

    wd = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    nxt = F.lead(type_col).over(wd)
    pairs = (
        df.select(user_col, ts_col, id_col, F.col(type_col).alias("from_type"),
                  nxt.alias("to_type"))
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out_deg = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(out_deg).cast("double")
        ).alias("p"),
    )
