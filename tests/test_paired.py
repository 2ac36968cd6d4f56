"""Paired/template sampling and guard tests — reference goldens
(reproducibility.rs:132-215) and guard behaviours (source.rs:57-116)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rasusa_spark.operators.paired import (
    ValidationError,
    assert_all_unmapped,
    check_name_grouped,
    one_pass_paired,
    one_pass_templates,
    probe_pairedness,
)
from rasusa_spark.synth import seed_tokens_df

from .test_rng import ONE_PASS_GOLDENS


def kept_ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_one_pass_paired_golden(spark, seed):
    """reproducibility.rs:132-215: paired one-pass keeps the same template
    sets as single-end (one shared draw), mates together."""
    r1 = seed_tokens_df(spark)
    r2 = seed_tokens_df(spark)  # same 16 templates
    k1, k2 = one_pass_paired(r1, r2, seed=seed, frac=0.5)
    expected = sorted(f"read{i}" for i in ONE_PASS_GOLDENS[seed])
    assert kept_ids(k1) == expected
    assert kept_ids(k2) == expected


def test_one_pass_paired_count_mismatch(spark):
    r1 = seed_tokens_df(spark)
    r2 = seed_tokens_df(spark).limit(10)
    with pytest.raises(ValueError, match="different read counts"):
        one_pass_paired(r1, r2, seed=1, frac=0.5)


@pytest.mark.parametrize("seed", [1, 3])
def test_one_pass_templates_matches_row_golden(spark, seed):
    """With unique templates in input order, the template sampler degenerates
    to the row sampler — must hit the same goldens."""
    df = seed_tokens_df(spark)
    out = one_pass_templates(df, seed=seed, frac=0.5)
    assert kept_ids(out) == sorted(f"read{i}" for i in ONE_PASS_GOLDENS[seed])


def test_one_pass_templates_keeps_segments_together(spark):
    df = seed_tokens_df(spark)
    # duplicate every row as a second segment of the same template
    doubled = df.union(df.withColumn("row_idx", F.col("row_idx") + 100))
    out = one_pass_templates(doubled, seed=2, frac=0.5)
    counts = out.groupBy("doc_id").count().collect()
    assert counts and all(r["count"] == 2 for r in counts)
    # template decisions match the single-segment golden (ordinals unchanged)
    assert set(r.doc_id for r in counts) == {
        f"read{i}" for i in ONE_PASS_GOLDENS[2]
    }


def test_guards(spark):
    df = seed_tokens_df(spark).withColumn("mapped", F.lit(False))
    assert_all_unmapped(df)
    with pytest.raises(ValidationError):
        assert_all_unmapped(df.withColumn("mapped", F.col("doc_id") == "read3"))

    check_name_grouped(seed_tokens_df(spark))  # unique names = grouped
    # interleave: read1, read2, read1 → not grouped
    bad = spark.createDataFrame(
        [("read1", 0), ("read2", 1), ("read1", 2)], "doc_id string, row_idx long"
    )
    with pytest.raises(ValidationError, match="not name-grouped"):
        check_name_grouped(bad)

    seg = spark.createDataFrame(
        [("a", "first", 0), ("a", "last", 1)], "doc_id string, segment string, row_idx long"
    )
    assert probe_pairedness(seg) is True
    assert probe_pairedness(seg.where(F.col("segment") == "first")) is False


def test_faidx_source(spark, tmp_path):
    from rasusa_spark.sources.faidx import genome_size_from_faidx

    fai = tmp_path / "ref.fa.fai"
    fai.write_text("chr1\t1000\t5\t60\t61\nchr2\t2500\t1100\t60\t61\n")
    assert genome_size_from_faidx(spark, str(fai)) == 3500


def test_downsample_templates_never_splits_mates(spark):
    """Two-pass template budget (reads.rs:451-463): per-template weight is
    the mate-length sum; a surviving template brings back BOTH segments, and
    the kept per-group template-weight total satisfies the budget crossing
    rule (>= budget, or everything kept)."""
    from rasusa_spark.operators.paired import downsample_templates

    rows = []
    for src in ("a", "b"):
        for t in range(200):
            for seg, w in (("first", 80 + t % 40), ("last", 90 + t % 30)):
                rows.append((f"{src}-t{t:03d}", src, seg, w))
    df = spark.createDataFrame(
        rows, "doc_id string, source string, segment string, n_tok int"
    )
    budget = 10_000
    kept = downsample_templates(
        df, seed=5, mode="bases", bases=budget, group_cols=("source",),
        strategy="threshold",
    )
    segs = kept.groupBy("doc_id").agg(F.collect_set("segment").alias("s")).collect()
    assert segs, "nothing kept"
    for r in segs:
        assert sorted(r.s) == ["first", "last"], f"{r.doc_id}: split template"
    # budget crossing per group over TEMPLATE weights: kept total crosses
    # the budget (or keeps all), and by less than one template's weight
    tpl_w = {
        (r.source, r.doc_id): r.w
        for r in df.groupBy("source", "doc_id").agg(F.sum("n_tok").alias("w")).collect()
    }
    kept_tpls = {
        (r.source, r.doc_id)
        for r in kept.select("source", "doc_id").distinct().collect()
    }
    for src in ("a", "b"):
        kept_sum = sum(w for (s, t), w in tpl_w.items() if s == src and (s, t) in kept_tpls)
        total = sum(w for (s, t), w in tpl_w.items() if s == src)
        assert kept_sum >= min(budget, total)
        assert kept_sum < budget + max(tpl_w.values()) or kept_sum == total
    # window and threshold strategies select the identical template set
    kept_w = downsample_templates(
        df, seed=5, mode="bases", bases=budget, group_cols=("source",),
        strategy="window",
    )
    assert sorted(tuple(r) for r in kept.collect()) == sorted(
        tuple(r) for r in kept_w.collect()
    )
