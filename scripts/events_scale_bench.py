#!/usr/bin/env python
"""Structure-preserving scale check for the round-4 timeseries/analytics
surface: synthesize an events-shaped table (the input_hint schema: event_id,
ts, user_id, event_type, value) at N and 10N rows where the TIME SPAN
scales with N and per-user-per-day density stays constant — so sessions,
buckets, counter samples, sketch cells and retention cohorts all scale
exactly linearly BY CONSTRUCTION, and any super-linear wall growth is the
engine's fault, not the workload's.

Generation is fully distributed and deterministic: spark.range + xxhash64
projections (zero driver data, zero Python in the data path), written to
parquet once per size and read back so every op pays the same scan.

Usage: python scripts/events_scale_bench.py [--base-rows 1000000]
Writes BENCH/events_scale.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from rasusa_spark.session import get_spark  # noqa: E402

BASE_DAYS = 30
N_USERS = 10_000
T0 = "2026-01-01 00:00:00"


def synth_events(spark, n_rows: int, scale: float, path: str):
    """Deterministic events table: span = BASE_DAYS * scale days, fixed
    user pool, fixed per-user-per-day density."""
    span_s = int(BASE_DAYS * scale * 86400)
    h = F.xxhash64(F.col("id"), F.lit(7))
    h2 = F.xxhash64(F.col("id"), F.lit(11))
    h3 = F.xxhash64(F.col("id"), F.lit(13))
    types = F.array(*[F.lit(t) for t in ("view", "click", "purchase", "signup", "error")])
    df = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit(T0))
            + F.make_dt_interval(secs=F.pmod(h, F.lit(span_s)).cast("double"))
        ).alias("ts"),
        F.pmod(h2, F.lit(N_USERS)).alias("user_id"),
        F.element_at(types, (F.pmod(h3, F.lit(5)) + 1).cast("int")).alias(
            "event_type"
        ),
        (F.pmod(h3, F.lit(100_000)).cast("double") / 100.0).alias("value"),
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def ops(ev):
    """The round-4 surface under test; each returns a DataFrame."""
    from rasusa_spark.functions.cms import (
        cms_estimate,
        cms_from_finer,
        cms_partials,
    )
    from rasusa_spark.functions.distinct import (
        distinct_from_finer,
        distinct_partials,
    )
    from rasusa_spark.operators.cohort import cohort_retention
    from rasusa_spark.operators.timeseries import (
        counter_increase,
        lttb_downsample,
        m4_downsample,
        rollup_sliding,
        sessionize,
        time_weighted_avg,
    )

    cents = ev.withColumn("n_tok", F.round(F.col("value") * 100).cast("int"))
    day = F.date_trunc("day", "ts").alias("day")

    def q_sessionize():
        return sessionize(cents, "30 minutes", value_col="n_tok")

    def q_counter():
        return counter_increase(
            cents, 86400, series_cols=("event_type",), value_col="n_tok",
            id_col="event_id",
        )

    def q_twa():
        return time_weighted_avg(
            cents, 3600, series_cols=("event_type",), value_col="n_tok",
            id_col="event_id",
        )

    def q_sliding():
        return rollup_sliding(
            cents, 3600, 900, group_cols=("event_type",), value_col="n_tok"
        )

    def q_m4():
        return m4_downsample(
            cents, 1800, group_cols=("event_type",), value_col="n_tok"
        )

    def q_lttb():
        # (type, day) groups: the bounded-group 100-TB shape
        return lttb_downsample(
            cents.withColumn("day", day), 50,
            group_cols=("event_type", "day"), value_col="n_tok",
            id_col="event_id",
        )

    def q_cms():
        h1 = cms_partials(ev, "1h", group_cols=("event_type",), item_col="user_id")
        d1 = cms_from_finer(h1, "1d", group_cols=("event_type",))
        cand = (
            ev.sparkSession.range(0, N_USERS, 97)
            .withColumnRenamed("id", "item")
        )
        return cms_estimate(d1, cand, group_cols=("event_type",), item_col="item")

    def q_distinct():
        h1 = distinct_partials(
            ev, "1h", group_cols=("event_type",), id_col="user_id"
        )
        return distinct_from_finer(h1, "1d", group_cols=("event_type",))

    def q_cohort():
        return cohort_retention(ev)

    from rasusa_spark.operators.timeseries import (
        ohlc_finalize,
        ohlc_from_finer,
        ohlc_partials,
        prom_rate,
        state_durations,
    )

    def q_ohlc():
        p1h = ohlc_partials(
            cents, 3600, series_cols=("event_type",), value_col="n_tok",
            id_col="event_id",
        )
        return ohlc_finalize(
            ohlc_from_finer(p1h, 86400, series_cols=("event_type",)),
            ("event_type",),
        )

    def q_state_dur():
        return state_durations(
            ev, 3600, series_cols=("user_id",), state_col="event_type",
            id_col="event_id",
        )

    def q_prom_rate():
        return prom_rate(
            cents, 3600, series_cols=("event_type",), value_col="n_tok",
            id_col="event_id",
        )

    return {
        "sessionize": q_sessionize,
        "counter_increase_1d": q_counter,
        "time_weighted_avg_1h": q_twa,
        "rollup_sliding_1h15m": q_sliding,
        "m4_30m": q_m4,
        "lttb_per_day": q_lttb,
        "cms_1h_1d_estimate": q_cms,
        "distinct_1h_1d": q_distinct,
        "cohort_retention": q_cohort,
        "ohlc_1h_1d": q_ohlc,
        "state_durations_1h": q_state_dur,
        "prom_rate_1h": q_prom_rate,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-rows", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(
        "events_scale", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [(args.base_rows, 1.0), (args.base_rows * 10, 10.0)]
    results: dict[str, dict[str, float]] = {}
    rowcounts: dict[str, int] = {}
    for n_rows, scale in sizes:
        tag = f"{scale:g}x"
        path = f"/tmp/events_scale_{n_rows}"
        ev = synth_events(spark, n_rows, scale, path)
        rowcounts[tag] = ev.count()
        for name, fn in ops(ev).items():
            fn().count()  # warm (plan + JIT)
            best = None
            for _ in range(args.repeats):
                spark.catalog.clearCache()
                t = time.perf_counter()
                fn().count()
                w = time.perf_counter() - t
                best = w if best is None else min(best, w)
            results.setdefault(name, {})[tag] = round(best, 3)
            print(f"{tag} {name}: {best:.2f}s", flush=True)

    report = {
        "base_rows": args.base_rows,
        "cpus": args.cpus,
        "rows": rowcounts,
        "queries": {
            name: {
                **vals,
                "ratio": round(vals["10x"] / vals["1x"], 2),
            }
            for name, vals in results.items()
        },
    }
    out = os.path.join(REPO, "BENCH", "events_scale.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
