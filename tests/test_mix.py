"""Domain-mixture resampling (operators/mix.py) — budget arithmetic,
selection contract vs a driver-side mirror, under-fill semantics, layout
invariance."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rasusa_spark.operators.mix import mix_corpus, mix_summary, mixture_budgets
from rasusa_spark.operators.text import token_count

SF = "/root/testdata/sf0.001"
KNUTH = 2654435761
WEIGHTS = {"en": 0.40, "fr": 0.35, "zh": 0.10, "es": 0.10, "de": 0.05}


def _key_expr():
    k32 = (F.col("doc_id") * KNUTH + F.lit(40503)) % F.lit(4294967296)
    return (k32 - F.lit(2147483648)) * F.lit(4294967296)


@pytest.fixture(scope="module")
def docs_tok(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("n_tok", token_count(F.col("text")))
        .cache()
    )


def test_mixture_budgets_arithmetic():
    assert mixture_budgets({"a": 1.0, "b": 1.0}, 1001) == {"a": 501, "b": 501}
    assert mixture_budgets({"a": 3.0, "b": 1.0}, 100) == {"a": 75, "b": 25}
    with pytest.raises(ValueError):
        mixture_budgets({"a": 0.0}, 100)
    with pytest.raises(ValueError):
        mixture_budgets({"a": 1.0}, 0)


def test_mix_corpus_matches_driver_mirror(spark, docs_tok):
    """The kept set equals the sequential per-domain budget-crossing
    selection computed independently on the driver (same portable key)."""
    total = 12_000
    budgets = mixture_budgets(WEIGHTS, total)
    rows = docs_tok.select("doc_id", "lang", "n_tok").collect()
    expected: set[int] = set()
    for lang, budget in budgets.items():
        members = sorted(
            (r for r in rows if r.lang == lang),
            key=lambda r: ((r.doc_id * KNUTH + 40503) % 4294967296, r.doc_id),
        )
        cum = 0
        for r in members:
            if cum < budget:
                expected.add(r.doc_id)
            cum += r.n_tok

    kept = mix_corpus(
        docs_tok, WEIGHTS, total, seed=0, domain_col="lang",
        key_expr=_key_expr(),
    )
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    assert got == expected

    relaid = mix_corpus(
        docs_tok.repartition(7), WEIGHTS, total, seed=0, domain_col="lang",
        key_expr=_key_expr(),
    )
    assert {r.doc_id for r in relaid.select("doc_id").collect()} == expected


def test_mix_corpus_underfill_and_drop(spark, docs_tok):
    """A domain whose share exceeds its corpus keeps everything (never
    rebalanced); domains absent from the weights are dropped entirely."""
    weights = {"fr": 0.9, "de": 0.1}  # fr share >> fr corpus
    total = 100_000
    kept = mix_corpus(
        docs_tok, weights, total, seed=0, domain_col="lang",
        key_expr=_key_expr(),
    )
    by_lang = {
        r.lang: r.n
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_fr = docs_tok.where(F.col("lang") == "fr").count()
    assert by_lang.get("fr") == n_fr  # keep-all under-fill
    assert set(by_lang) <= {"fr", "de"}  # en/zh/es dropped

    summ = {
        r.lang: r
        for r in mix_summary(
            kept, weights, total, domain_col="lang"
        ).collect()
    }
    fr_tokens = (
        docs_tok.where(F.col("lang") == "fr")
        .agg(F.sum("n_tok"))
        .collect()[0][0]
    )
    assert summ["fr"].kept_tokens == fr_tokens
    assert summ["fr"].kept_tokens < summ["fr"].budget  # under-fill visible
    assert abs(sum(r.realized_share for r in summ.values()) - 1.0) < 1e-6


def test_mix_corpus_xxhash_default_key(spark, docs_tok):
    """Without key_expr the key is the engine's xxhash64(seed, domain, id)
    — still deterministic and layout-invariant; different seeds select
    different prefixes."""
    a = {
        r.doc_id
        for r in mix_corpus(
            docs_tok, WEIGHTS, 8_000, seed=1, domain_col="lang"
        ).collect()
    }
    b = {
        r.doc_id
        for r in mix_corpus(
            docs_tok.repartition(5), WEIGHTS, 8_000, seed=1, domain_col="lang"
        ).collect()
    }
    c = {
        r.doc_id
        for r in mix_corpus(
            docs_tok, WEIGHTS, 8_000, seed=2, domain_col="lang"
        ).collect()
    }
    assert a == b
    assert a != c
