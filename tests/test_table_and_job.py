"""Table layout + spark-submit job entry tests (M9)."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

from pyspark.sql import functions as F

from rasusa_spark.sources.table import read_tokens_table, write_tokens_table
from rasusa_spark.synth import tokens_raw_df

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_partition_layout_and_pruning(spark, tmp_path):
    df = tokens_raw_df(spark, 2000, with_tokens=False, partitions=4)
    loc = str(tmp_path / "tokens")
    write_tokens_table(df, loc, mode="overwrite")
    dirs = glob.glob(os.path.join(loc, "source=*", "bucket_day=*"))
    assert dirs, "expected source=/bucket_day= hive layout"

    back = read_tokens_table(spark, loc)
    assert back.count() == 2000
    # partition pruning: a source+day filter must prune the scan
    one = back.where(F.col("source") == "wiki")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() < 2000


def test_format_compression_inference(spark, tmp_path):
    """S8 (format.rs:26-93, cli.rs:421-470): format + codec from the path,
    trailing compression extension stripped first; one-letter codes; level
    range validation; end-to-end write with inferred json+gzip."""
    import pytest

    from rasusa_spark.sources.formats import (
        infer_compression,
        infer_format,
        parse_compression_format,
        parse_level,
        write_inferred,
        writer_options,
    )

    assert infer_format("/a/b/data.parquet") == "parquet"
    assert infer_format("out.jsonl.gz") == "json"
    assert infer_format("x.csv.zst") == "csv"
    assert infer_format("noext") is None
    assert infer_compression("out.jsonl.gz") == "gzip"
    assert infer_compression("x.csv.zst") == "zstd"
    assert infer_compression("plain.csv") is None

    # one-letter codes (cli.rs:421-431) and level range (cli.rs:443-470)
    assert parse_compression_format("z") == "zstd"
    assert parse_compression_format("U") == "none"
    with pytest.raises(ValueError, match="invalid compression"):
        parse_compression_format("q")
    assert parse_level("21") == 21
    for bad in ("0", "22", "x"):
        with pytest.raises(ValueError, match="range 1-21"):
            parse_level(bad)

    # explicit args beat inference; invalid sink/codec combos fail loudly
    fmt, opts = writer_options("d.csv.gz", output_format="json")
    assert fmt == "json" and opts["compression"] == "gzip"
    with pytest.raises(ValueError, match="not supported"):
        writer_options("d.parquet.bz2")
    fmt, opts = writer_options("d.parquet.zst", level=19)
    assert opts["parquet.compression.codec.zstd.level"] == "19"

    # end-to-end: inferred gzip json round-trips
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    dest = str(tmp_path / "out.jsonl.gz")
    write_inferred(df, dest)
    assert glob.glob(os.path.join(dest, "*.json.gz"))
    back = spark.read.json(dest)
    assert back.count() == 2


def test_run_job_cli(spark, tmp_path):
    """The spark-submit entry runs standalone (local master) end-to-end."""
    df = tokens_raw_df(spark, 1500, with_tokens=False, partitions=2)
    inp = str(tmp_path / "in")
    write_tokens_table(df, inp, mode="overwrite")
    env = dict(os.environ, SPARK_GRAFT_MASTER="local[2]", PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_job.py"),
            "--input", inp,
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ck"),
            "--run-id", "t1",
            "--mode", "bases",
            "--coverage", "2.0",
            "--genome-size", "1.5kb",
            "--seed", "11",
            "--rollup",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "committed" in out.stdout
    assert os.path.exists(str(tmp_path / "out" / "rollup_1h"))
    assert os.path.exists(str(tmp_path / "out" / "metric_blobs_1h"))


def test_compact_tokens_table(spark, tmp_path):
    from rasusa_spark.sources.table import compact_tokens_table

    loc = str(tmp_path / "tok")
    df = tokens_raw_df(spark, 4000, with_tokens=False, partitions=8)
    write_tokens_table(df, loc, mode="overwrite")
    before = read_tokens_table(spark, loc)
    rows_before = sorted(
        (r.doc_id, r.n_tok, r.source) for r in before.select("doc_id", "n_tok", "source").collect()
    )
    dirs = glob.glob(os.path.join(loc, "source=*", "bucket_day=*"))
    files_before = {d: len(glob.glob(os.path.join(d, "*.parquet"))) for d in dirs}
    assert max(files_before.values()) > 1  # small-file problem planted

    n = compact_tokens_table(spark, loc, target_file_bytes=1 << 30)
    assert n == len(dirs)
    files_after = {d: len(glob.glob(os.path.join(d, "*.parquet"))) for d in dirs}
    assert all(c == 1 for c in files_after.values())
    rows_after = sorted(
        (r.doc_id, r.n_tok, r.source)
        for r in read_tokens_table(spark, loc).select("doc_id", "n_tok", "source").collect()
    )
    assert rows_after == rows_before  # data byte-identical

    # second pass: nothing to do, nothing rewritten
    mtimes = {d: os.path.getmtime(d) for d in dirs}
    assert compact_tokens_table(spark, loc, target_file_bytes=1 << 30) == 0
    assert {d: os.path.getmtime(d) for d in dirs} == mtimes
