"""Incremental rollup maintenance + Structured Streaming ingestion
(SURVEY §2.10; north_rule: "continuous aggregates", "bucket watermarks").

Two complementary paths:

- ``merge_rollup_increment`` — batch-incremental continuous-aggregate
  maintenance: partial-aggregate ONLY the new rows, then merge into the
  stored tier by re-aggregating (sum-of-sums / min-of-mins — the same
  associativity that makes tier re-rollup exact). Buckets older than the
  stored watermark are rejected as late (the engine analog of the
  reference's ordered-input guard, source.rs:57-116) or accepted when
  ``allow_late`` (they merge exactly, since merge is associative).

- ``streaming_rollup`` — true Structured Streaming: file-source readStream →
  event-time window aggregate with a watermark → parquet/memory sink.
  At cluster scale the same query runs against Kafka/Iceberg sources
  unchanged; state-store handles the open buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import TIERS, rollup

_AGGS = ["n_tok_sum", "row_count", "n_tok_min", "n_tok_max"]


def merge_rollup_increment(
    spark: SparkSession,
    new_rows: DataFrame,
    state_path: str,
    tier: str = "1h",
    group_cols: tuple[str, ...] | list[str] = ("source",),
    allow_late: bool = False,
) -> DataFrame:
    """Fold ``new_rows`` into the stored tier at ``state_path``; returns the
    updated tier. Watermark = max bucket per group already stored; late rows
    (bucket < watermark) raise unless ``allow_late``."""
    group_cols = list(group_cols)
    inc = rollup(new_rows, tier, group_cols=group_cols)

    store = os.path.join(state_path, f"rollup_{tier}")
    try:
        existing = spark.read.parquet(store)
        have_state = True
    except Exception:
        existing = None
        have_state = False

    if have_state:
        if not allow_late:
            wm = existing.groupBy(*group_cols).agg(
                F.max("bucket_start").alias("_wm")
            )
            late = inc.join(wm, on=group_cols, how="inner").where(
                F.col("bucket_start") < F.col("_wm")
            )
            n_late = late.count()
            if n_late:
                raise ValueError(
                    f"{n_late} late bucket-updates behind the watermark; "
                    "pass allow_late=True to merge them (exact, associative)"
                )
        merged = (
            existing.unionByName(inc)
            .groupBy(*group_cols, "bucket_start")
            .agg(
                F.sum("n_tok_sum").alias("n_tok_sum"),
                F.sum("row_count").alias("row_count"),
                F.min("n_tok_min").alias("n_tok_min"),
                F.max("n_tok_max").alias("n_tok_max"),
            )
            .withColumn("gap_filled", F.lit(False))
        )
    else:
        merged = inc

    tmp = store + "_next"
    merged.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(store)
    return spark.read.parquet(store)


def streaming_rollup(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    schema,
    tier: str = "1h",
    group_cols: tuple[str, ...] | list[str] = ("source",),
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Structured Streaming continuous aggregate: parquet file source →
    watermark + event-time window → append-mode parquet sink. Returns the
    StreamingQuery (caller awaits termination)."""
    window_len = {"1h": "1 hour", "1d": "1 day"}[tier]
    stream = (
        spark.readStream.schema(schema).format("parquet").load(input_path)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(*group_cols, F.window("ts", window_len).alias("w"))
        .agg(
            F.sum(F.col("n_tok").cast("long")).alias("n_tok_sum"),
            F.count(F.lit(1)).alias("row_count"),
            F.min("n_tok").alias("n_tok_min"),
            F.max("n_tok").alias("n_tok_max"),
        )
        .select(*group_cols, F.col("w.start").alias("bucket_start"), *_AGGS)
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
