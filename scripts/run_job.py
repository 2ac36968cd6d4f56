#!/usr/bin/env python
"""spark-submit entry point for the production downsample+rollup job
(north_rule: "run via spark-submit --py-files on a multi-executor cluster").

Package + submit:

    cd /root/repo && zip -r /tmp/rasusa_spark.zip rasusa_spark
    spark-submit --py-files /tmp/rasusa_spark.zip scripts/run_job.py \\
        --input  <tokens table location> \\
        --output <retained table location> \\
        --checkpoint <commit-log location> \\
        --mode bases --bases 50000000 --seed 42 --run-id run-001

The job is resumable: rerunning with the same checkpoint skips committed
(source, bucket) partitions (rasusa_spark.plans.checkpoint)."""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--mode", default="bases", choices=["bases", "num", "frac", "one_pass"])
    ap.add_argument("--bases", type=int)
    ap.add_argument("--coverage", type=float)
    ap.add_argument("--genome-size", type=str, help="e.g. 4.2mb (metric suffix)")
    ap.add_argument("--num", type=int)
    ap.add_argument("--frac", type=float)
    ap.add_argument(
        "--probability", type=float, default=None,
        help="shorthand for --frac P with one-pass sampling (reads.rs -p)",
    )
    ap.add_argument("--strict", action="store_true")
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--strategy", default="threshold")
    ap.add_argument("--rollup", action="store_true", help="also maintain 1h/1d tiers")
    ap.add_argument(
        "--drop-raw-before", type=str, default=None,
        help="retention: drop raw retained partitions with bucket_start "
             "before this ISO timestamp, after verifying the 1h tier covers "
             "them bit-for-bit (implies --rollup ran this or a prior run)",
    )
    ap.add_argument(
        "--compact-target-mb", type=int, default=None,
        help="store maintenance: bin-pack the retained partitions' small "
             "files toward this target file size (Iceberg "
             "rewrite_data_files analog); runs after commit/retention",
    )
    args = ap.parse_args()

    # imports resolve from --py-files on executors
    from rasusa_spark import sampler
    from rasusa_spark.args import JobArgs, validate_job_args

    # reject contradictory combinations BEFORE any Spark work is scheduled
    # (the reference CLI's clap conflict matrix, reads.rs:27-243)
    normalized = validate_job_args(
        JobArgs(
            inputs=(args.input,),
            outputs=(args.output,),
            coverage=args.coverage,
            genome_size=(
                sampler.parse_metric_size(args.genome_size)
                if args.genome_size else None
            ),
            bases=args.bases,
            num=args.num,
            frac=args.frac,
            probability=args.probability,
            one_pass=(args.mode == "one_pass"),
            strict=args.strict,
        )
    )
    if normalized.one_pass:
        args.mode, args.frac = "one_pass", normalized.frac
    from rasusa_spark.codecs.blobs import compress_metric_streams
    from rasusa_spark.operators.rollup import rollup_all_tiers
    from rasusa_spark.plans.checkpoint import DownsampleJob, read_retained, run_downsample_job
    from rasusa_spark.sources.table import read_tokens_table

    spark = SparkSession.builder.appName(f"rasusa_spark:{args.run_id}").getOrCreate()

    bases = args.bases
    if bases is None and args.coverage and args.genome_size:
        gsize = sampler.parse_metric_size(args.genome_size)
        bases = sampler.target_bases_from_coverage(gsize, args.coverage)

    job = DownsampleJob(
        seed=args.seed,
        mode=args.mode,
        bases=bases,
        num=args.num,
        frac=args.frac,
        strategy=args.strategy,
    )
    df = read_tokens_table(spark, args.input)
    commits = run_downsample_job(
        spark, df, job, args.output, args.checkpoint, run_id=args.run_id
    )
    print(f"committed {commits.count()} buckets this run")

    if args.rollup:
        kept = read_retained(spark, args.output)
        tiers = rollup_all_tiers(kept)
        for name, tier_df in tiers.items():
            tier_df.write.mode("overwrite").parquet(
                os.path.join(args.output, f"rollup_{name}")
            )
        compress_metric_streams(tiers["1h"]).write.mode("overwrite").parquet(
            os.path.join(args.output, "metric_blobs_1h")
        )

    if args.drop_raw_before:
        from rasusa_spark.plans.retention import apply_retention

        log = apply_retention(
            spark, args.output, drop_before=args.drop_raw_before, tier="1h",
            run_id=args.run_id, checkpoint_path=args.checkpoint,
        )
        print(f"retention dropped {log.count()} raw partitions")

    if args.compact_target_mb:
        from rasusa_spark.sources.table import compact_tokens_table

        n = compact_tokens_table(
            spark, os.path.join(args.output, "retained"),
            target_file_bytes=args.compact_target_mb << 20,
        )
        print(f"compacted {n} retained partitions")
    spark.stop()


if __name__ == "__main__":
    main()
