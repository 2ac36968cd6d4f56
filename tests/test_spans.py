"""Exact substring (token-window) dedup — operators/spans.py: planted
duplicate phrases, span merging, canonical-keep removal, layout
invariance."""

from __future__ import annotations

import pytest

from rasusa_spark.operators.spans import (
    duplicated_spans,
    remove_duplicated_spans,
    substring_dup_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


PHRASE = "the quick brown fox jumps over the lazy dog again"  # 10 words


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, "alpha beta gamma " + PHRASE + " delta epsilon zeta"),
        (2, "one two three four five " + PHRASE + " six seven"),
        (3, "totally unique words nothing shared here at all ok fine"),
    ]
    return _docs(spark, rows)


def test_duplicated_spans_cross_doc(spark, planted):
    spans = {
        (r.doc_id): (r.span_start, r.span_end)
        for r in duplicated_spans(planted, n=4).collect()
    }
    # doc1: phrase at words [3, 13); doc2: at [5, 15); doc3 absent
    assert spans[1] == (3, 13)
    assert spans[2] == (5, 15)
    assert 3 not in spans


def test_duplicated_spans_within_doc(spark):
    df = _docs(
        spark,
        [(7, "x y z " + PHRASE + " mid words only " + PHRASE + " tail unique")],
    )
    got = sorted(
        (r.span_start, r.span_end) for r in duplicated_spans(df, n=4).collect()
    )
    # two islands: [3,13) and [16,26)
    assert got == [(3, 13), (16, 26)]


def test_substring_dup_stats(spark, planted):
    stats = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens)
        for r in substring_dup_stats(planted, n=4).collect()
    }
    assert stats == {1: (1, 10), 2: (1, 10)}


def test_remove_keeps_canonical_occurrence(spark, planted):
    out = {r.doc_id: r.text for r in remove_duplicated_spans(planted, n=4).collect()}
    # doc1 is the canonical (min doc id) occurrence -> unchanged
    assert out[1] == "alpha beta gamma " + PHRASE + " delta epsilon zeta"
    # doc2 loses exactly the phrase
    assert out[2] == "one two three four five six seven"
    assert out[3].startswith("totally unique")


def test_remove_within_doc_keeps_first(spark):
    df = _docs(
        spark,
        [(7, "x y z " + PHRASE + " mid words only " + PHRASE + " tail unique")],
    )
    out = remove_duplicated_spans(df, n=4).collect()[0].text
    assert out == "x y z " + PHRASE + " mid words only tail unique"


def test_short_docs_pass_through(spark):
    df = _docs(spark, [(1, "tiny doc"), (2, "tiny doc")])
    out = {r.doc_id: r.text for r in remove_duplicated_spans(df, n=4).collect()}
    assert out == {1: "tiny doc", 2: "tiny doc"}


def test_remove_preserves_original_casing(spark):
    # ADVICE r3: matching is case-insensitive (fingerprints hash the
    # lowered copy) but reconstruction must keep the ORIGINAL casing.
    df = _docs(
        spark,
        [
            (1, "Alpha BETA gamma " + PHRASE + " Delta"),
            (2, "One TWO three four five " + PHRASE.upper() + " Six"),
        ],
    )
    out = {r.doc_id: r.text for r in remove_duplicated_spans(df, n=4).collect()}
    # doc1 canonical -> untouched, original text verbatim
    assert out[1] == "Alpha BETA gamma " + PHRASE + " Delta"
    # doc2 loses the (case-insensitively matched) phrase, keeps its casing
    assert out[2] == "One TWO three four five Six"


def test_remove_untouched_doc_keeps_whitespace(spark):
    # untouched and short docs pass through VERBATIM — tabs, runs of
    # spaces, leading/trailing whitespace all intact
    raw = "  totally\tunique   words nothing shared here at all ok fine "
    df = _docs(spark, [(1, raw), (2, "tiny\t doc")])
    out = {r.doc_id: r.text for r in remove_duplicated_spans(df, n=4).collect()}
    assert out == {1: raw, 2: "tiny\t doc"}


def test_remove_dense_spans_linear(spark):
    # adversarial shape (VERDICT r3 #5): ~5k disjoint struck spans in one
    # doc (alternating hot window / unique filler). The gap-slice rebuild
    # is O(tokens + spans); the old per-token exists() was tokens x spans.
    import time

    S = 5000
    hot = "h1 h2 h3 h4"
    body = " ".join(f"{hot} u{i}a u{i}b u{i}c u{i}d" for i in range(S))
    df = _docs(spark, [(1, body)])
    t0 = time.perf_counter()
    out = remove_duplicated_spans(df, n=4).collect()[0].text
    wall = time.perf_counter() - t0
    toks = out.split(" ")
    # first hot occurrence kept, all later ones struck; filler intact
    assert toks[:4] == ["h1", "h2", "h3", "h4"]
    assert toks.count("h1") == 1
    assert len(toks) == 4 + 4 * S
    assert wall < 30, f"dense-span removal took {wall:.1f}s"


def test_spans_layout_invariant(spark, planted):
    a = sorted(map(tuple, duplicated_spans(planted, n=4).collect()))
    b = sorted(map(tuple, duplicated_spans(planted.repartition(5), n=4).collect()))
    assert a == b


def test_portable_hash_family_agrees(spark, planted):
    a = sorted(map(tuple, duplicated_spans(planted, n=4).collect()))
    b = sorted(map(tuple, duplicated_spans(planted, n=4, portable=True).collect()))
    assert a == b


def test_kernel_windows_match_transform(spark):
    """r7: the Arrow-kernel fingerprint family (_windows_kernel) must
    induce the SAME window equality classes as the portable md5 family —
    compare the partition of (doc, pos) into fingerprint groups, not the
    values, on docs with repeated windows, unicode and messy whitespace."""
    from rasusa_spark.operators.spans import _windows

    rows = [
        (1, "a b c d a b c d a b c d"),
        (2, "  a b C d\tA b c D  "),
        (3, "İstanbul ΣΟΦΟΣ ΑΣ ß İstanbul ΣΟΦΟΣ ΑΣ ß end"),
        (4, "x " * 30),
        (5, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def classes(wins):
        groups: dict = {}
        for r in wins.collect():
            groups.setdefault(r["_wh"], set()).add((r["doc_id"], r["pos"]))
        return sorted(map(frozenset, groups.values()), key=sorted)

    a = classes(_windows(df, 3, "text", "doc_id", portable=False))
    b = classes(_windows(df, 3, "text", "doc_id", portable=True))
    assert a == b
