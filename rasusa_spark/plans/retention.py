"""Retention-policy enforcement for the tiered store (north_rule:
"coarser retention tiers (raw → 1h → 1d)") — the TimescaleDB
``drop_chunks``/retention-policy analog for the engine's partitioned
retained output.

Semantics: raw retained partitions whose bucket_start < cutoff are
DROPPED, but only after a coverage check proves the coarser tier still
holds their aggregates bit-for-bit (integer accumulators make this an
exact equality, not a tolerance). A refused drop deletes nothing.

Mechanics:

- the drop list comes from the retained data itself (one distinct over
  the partition columns — bounded by partition count, never row count);
- the coverage check re-rolls the ABOUT-TO-DROP rows to the tier's
  granularity and anti-joins against the stored tier on
  (source, bucket, n_tok_sum, row_count): any row of the fresh rollup
  missing from the store means the tier does not cover the span →
  RetentionError, nothing deleted;
- deletion goes through the Hadoop FileSystem API (works on local paths
  here and on HDFS/S3A on a real cluster — never ``shutil``);
- every dropped partition is appended to a ``retention`` log next to the
  commit log, carrying (source, bucket_start, rows/tokens dropped,
  run id) — the lineage story stays complete after the raw rows are gone.

Reference: rasusa has no storage tiering; the tier layout mirrors
scripts/run_job.py (`retained/` + `rollup_{raw,1h,1d}/`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import TIERS, rollup

RETENTION_SCHEMA = (
    "run_id string, source string, bucket_start timestamp, "
    "rows_dropped long, n_tok_dropped long, tier string"
)


class RetentionError(RuntimeError):
    """The coarser tier does not cover the span requested for dropping."""


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath  # noqa: SLF001


def apply_retention(
    spark: SparkSession,
    output_path: str,
    *,
    drop_before: str,
    tier: str = "1h",
    run_id: str = "retention",
    checkpoint_path: str | None = None,
    force: bool = False,
) -> DataFrame:
    """Drop retained raw partitions with ``bucket_start < drop_before``
    (ISO timestamp string), verifying coverage against the stored
    ``rollup_{tier}`` first. Returns the retention-log rows written by this
    invocation (empty if nothing qualified).

    ``force=True`` skips the coverage check — for operators that have
    already exported the span elsewhere. The check otherwise requires
    ``{output_path}/rollup_{tier}`` to exist (written by run_job --rollup
    or streaming.incremental)."""
    retained_path = os.path.join(output_path, "retained")
    cutoff = F.to_timestamp(F.lit(drop_before))

    retained = spark.read.parquet(retained_path)
    doomed = retained.where(F.col("bucket_start") < cutoff)

    # partition list + per-partition stats in one bounded aggregate
    stats = (
        doomed.groupBy("source", "bucket_id", "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("rows_dropped"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tok_dropped"),
        )
        .collect()
    )
    if not stats:
        return spark.createDataFrame([], RETENTION_SCHEMA)

    if not force:
        tier_path = os.path.join(output_path, f"rollup_{tier}")
        if tier not in TIERS:
            raise ValueError(f"unknown tier {tier!r}")
        stored = spark.read.parquet(tier_path).where(~F.col("gap_filled"))
        fresh = rollup(doomed, tier, group_cols=("source",))
        uncovered = fresh.join(
            stored,
            on=["source", "bucket_start", "n_tok_sum", "row_count"],
            how="left_anti",
        )
        missing = uncovered.select("source", "bucket_start").limit(5).collect()
        if missing:
            raise RetentionError(
                f"rollup_{tier} does not cover the drop span bit-for-bit; "
                f"first uncovered buckets: "
                f"{[(r.source, str(r.bucket_start)) for r in missing]} — "
                "nothing was deleted"
            )

    # delete partition directories through the Hadoop FS (storage-agnostic)
    fs, _ = _hadoop_fs(spark, retained_path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path  # noqa: SLF001
    for r in stats:
        part_dir = os.path.join(
            retained_path, f"source={r.source}", f"bucket_id={r.bucket_id}"
        )
        fs.delete(jvm_path(part_dir), True)

    log_rows = [
        (run_id, r.source, r.bucket_start, r.rows_dropped, r.n_tok_dropped, tier)
        for r in stats
    ]
    log_df = spark.createDataFrame(log_rows, RETENTION_SCHEMA)
    log_path = os.path.join(
        checkpoint_path or output_path, "retention"
    )
    log_df.write.mode("append").parquet(log_path)
    return log_df


def read_retention_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "retention"))
