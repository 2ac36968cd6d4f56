"""Argument-combination validation matrix (rasusa_spark/args.py) — mirrors
the reference CLI's clap conflict rules and the error battery in
tests/cli.rs / reads.rs:27-243. Pure Python, no Spark session needed."""

from __future__ import annotations

import pytest

from rasusa_spark.args import ArgCombinationError, JobArgs, validate_job_args


def ok(**kw):
    kw.setdefault("inputs", ("tokens/",))
    return validate_job_args(JobArgs(**kw))


def err(match, **kw):
    kw.setdefault("inputs", ("tokens/",))
    with pytest.raises(ArgCombinationError, match=match):
        validate_job_args(JobArgs(**kw))


def test_no_target_given_raises():
    err("no target")


def test_coverage_requires_genome_size_and_vice_versa():
    err("missing genome_size", coverage=3.0)
    err("missing coverage", genome_size=25_000)
    assert ok(coverage=3.0, genome_size=25_000).coverage == 3.0


@pytest.mark.parametrize(
    "kw",
    [
        dict(coverage=3.0, genome_size=1, num=5),
        dict(coverage=3.0, genome_size=1, frac=0.5),
        dict(coverage=3.0, genome_size=1, probability=0.5),
        dict(bases=100, num=5),
        dict(bases=100, frac=0.5),
        dict(bases=100, probability=0.5),
        dict(num=5, frac=0.5),
        dict(num=5, probability=0.5),
        dict(frac=0.5, probability=0.5),
    ],
)
def test_target_conflicts(kw):
    err("conflicting targets", **kw)


def test_probability_expands_to_frac_one_pass():
    n = ok(probability=0.25)
    assert n.probability is None and n.frac == 0.25 and n.one_pass


def test_probability_conflicts_with_strict():
    err("probability cannot be combined with strict", probability=0.25, strict=True)


def test_one_pass_requires_frac():
    err("one_pass requires frac", num=5, one_pass=True)
    err("one_pass requires frac", bases=100, one_pass=True)
    err("one_pass requires frac", coverage=2.0, genome_size=10, one_pass=True)
    assert ok(frac=0.5, one_pass=True).one_pass


def test_one_pass_rejects_strict():
    err("one_pass cannot be combined with strict", frac=0.5, one_pass=True, strict=True)


def test_one_pass_rejects_two_alignment_inputs():
    err(
        "two separate alignment inputs",
        inputs=("a.bam", "b.bam"),
        outputs=("o1/", "o2/"),
        frac=0.5,
        one_pass=True,
    )
    # a single grouped alignment file is fine
    assert ok(inputs=("a.bam",), frac=0.5, one_pass=True).one_pass


def test_input_output_combination():
    err("at least one input", inputs=(), frac=0.5)
    err("more than 2 inputs", inputs=("a", "b", "c"), frac=0.5)
    err(
        "more than 2 outputs",
        inputs=("a",), outputs=("x", "y", "z"), frac=0.5,
    )
    err("counts must match", inputs=("a", "b"), outputs=("x",), frac=0.5)
    err("counts must match", inputs=("a",), outputs=("x", "y"), frac=0.5)
    # 1 input + 0 outputs = default sink (stdout analog)
    assert ok(inputs=("a",), outputs=(), frac=0.5)
    assert ok(inputs=("a", "b"), outputs=("x", "y"), frac=0.5)


def test_table_to_alignment_conversion_rejected():
    err(
        "not supported",
        inputs=("tokens.parquet",),
        outputs=("out.bam",),
        frac=0.5,
    )
    err(
        "not supported",
        inputs=("tokens.parquet",),
        outputs=("out/",),
        output_format="bam",
        frac=0.5,
    )
    # compression extension is stripped first, like infer_format
    err(
        "not supported",
        inputs=("tokens.parquet",),
        outputs=("out.sam.gz",),
        frac=0.5,
    )
    # alignment input -> alignment output is allowed
    assert ok(inputs=("in.bam",), outputs=("out.bam",), frac=0.5)
