"""Exact substring (token-window) deduplication — the corpus-level
"repeated 50-gram" pass of Lee et al. 2022 (*Deduplicating Training Data
Makes Language Models Better*), re-expressed Spark-first. The suffix-array
formulation is replaced by overlapping fixed-length window fingerprints at
stride 1, which finds exactly the duplicated substrings of length ≥ n (a
substring repeat of length L ≥ n contains L−n+1 repeated n-windows, and a
repeated n-window IS a length-n substring repeat), up to 64-bit fingerprint
collisions — the same contract as the engine's other hashed dedup paths.

Pipeline (all DataFrame ops, no Python in the hot path):

1. explode every doc into its n-token windows, fingerprinted JVM-side
   (one xxhash64 over the n word columns — word_shingles_hashed's trick,
   POSITIONED, not distinct);
2. one map-side-combinable groupBy(fingerprint) finds windows occurring
   more than once in the corpus (within- or cross-doc, the paper's
   definition) — a hot boilerplate window collapses to ONE reduce row;
3. semi-join flagged fingerprints back to their (doc, position)s and merge
   overlapping windows into maximal duplicated SPANS per doc (classic
   gaps-and-islands with window functions — partitioned by doc, never a
   corpus-wide sort);
4. (removal) the canonical occurrence — global min (doc_id, start) per
   fingerprint — is KEPT; positions covered only by non-canonical
   occurrences are struck, and surviving tokens rebuild the text in
   original order.

Scale shape: the window table is |tokens| rows of (8 B hash, id, pos) —
large but shuffle-bounded and combinable; there is no quadratic join
anywhere (occurrence lists only materialize for fingerprints with >1 hit,
and even those go through count/min aggregates, not pairs).

Reference: rasusa has no substring dedup; this extends the dedup stack
(SURVEY §2.12 additions) like dedup.py's other modalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _windows(
    df: DataFrame, n: int, text_col: str, id_col: str, portable: bool
) -> DataFrame:
    """(id, pos, _wh): every length-n word window at stride 1, with a
    64-bit fingerprint (xxhash64 over the n words) or — ``portable`` — the
    md5 hex of the 0x1f-joined window, reproducible in any SQL engine for
    the driver oracle."""
    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    with_words = df.select(F.col(id_col), words_expr.alias("_w")).where(
        F.size("_w") >= n
    )
    w = F.col("_w")
    if portable:
        # 60-bit slice of the md5 as a LONG (15 hex chars < 2^63): the
        # fingerprint is only a distinctness identity, and long keys make
        # the downstream aggregate/semi-join/cache 8-byte rows instead of
        # 32-char strings (r7: the cached window table, hot aggregate and
        # probe join all run on longs). Distinct windows ↔ distinct
        # fingerprints up to 2^-60 collisions — the engine's documented
        # hashed-dedup contract; the md5 base keeps it reproducible in any
        # SQL engine (conv(substr(md5(x),1,15),16,10)).
        fp = lambda i: F.conv(  # noqa: E731
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f", *[F.element_at(w, i + j + 1) for j in range(n)]
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    else:
        fp = lambda i: F.xxhash64(  # noqa: E731
            *[F.element_at(w, i + j + 1) for j in range(n)]
        )
    wins = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.struct(i.alias("pos"), fp(i).alias("_wh")),
    )
    return with_words.select(
        F.col(id_col), F.explode(wins).alias("s")
    ).select(id_col, F.col("s.pos").alias("pos"), F.col("s._wh").alias("_wh"))


def duplicated_spans(
    df: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated substring spans per document:
    ``(id, span_start, span_end)`` — token positions [start, end) covered
    by some n-window occurring ≥ ``min_count`` times in the corpus.
    Overlapping/adjacent duplicated windows merge into one maximal span
    (gaps-and-islands per doc).

    r7 shape: ONE pass over the window table — hash-repartition by
    fingerprint co-locates every occurrence of a fingerprint in one
    partition, so a per-partition Arrow kernel (np.unique counts over
    the partition's fingerprints, zero-copy column access) emits exactly
    the rows whose fingerprint repeats ≥ ``min_count`` corpus-wide. The
    former shape evaluated the window table twice (hot-count aggregate +
    semi-join probe — the shared-subtree trap) or paid a persist of it;
    both the near-1:1-group count aggregate and the join are gone. Skew
    bound: a hot fingerprint contributes ROWS to one partition (its
    occurrence count), never pairs."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql import types as T

    wins = _windows(df, n, text_col, id_col, portable)
    id_type = df.schema[id_col].dataType
    marked_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("_s", T.IntegerType()),
            T.StructField("_e", T.IntegerType()),
        ]
    )
    mc = int(min_count)
    nn = int(n)

    def dup_rows(batches):
        tbl = pa.Table.from_batches(list(batches))
        if tbl.num_rows == 0:
            return
        fp = tbl.column("_wh").combine_chunks().to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(fp, return_inverse=True, return_counts=True)
        keep = cnt[inv] >= mc
        pos = tbl.column("pos").combine_chunks().to_numpy()[keep]
        ids = tbl.column(id_col).combine_chunks().take(
            pa.array(np.flatnonzero(keep))
        )
        yield pa.record_batch(
            {
                id_col: ids,
                "_s": pa.array(pos.astype(np.int32)),
                "_e": pa.array((pos + nn).astype(np.int32)),
            }
        )

    marked = (
        wins.repartition(F.col("_wh"))
        .mapInArrow(dup_rows, marked_schema)
    )
    wd = Window.partitionBy(id_col).orderBy("_s")
    prev_max_e = F.max("_e").over(wd.rowsBetween(Window.unboundedPreceding, -1))
    island = F.sum(
        F.when(prev_max_e.isNull() | (F.col("_s") > prev_max_e), 1).otherwise(0)
    ).over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        marked.withColumn("_isl", island)
        .groupBy(id_col, "_isl")
        .agg(
            F.min("_s").alias("span_start"),
            F.max("_e").alias("span_end"),
        )
        .drop("_isl")
    )


def substring_dup_stats(
    df: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Per-doc duplication profile: number of maximal duplicated spans and
    total duplicated token positions — the corpus-quality metric the Lee
    et al. pass reports before removal. Docs with no duplicated window are
    absent (join back for zeros if needed)."""
    spans = duplicated_spans(df, n, text_col, id_col, portable)
    return spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Strike duplicated substrings, KEEPING the canonical (globally first
    by (doc, position)) occurrence of each repeated window — Lee et al.'s
    remove-all-but-one policy. A token position survives unless some
    duplicated window covers it at a NON-canonical occurrence. Returns
    (id, text).

    Output contract (ADVICE r3): docs with nothing to strike — including
    docs shorter than n tokens — pass through with their ORIGINAL text
    verbatim. Docs with struck spans are rebuilt from the original-cased
    tokens joined by single spaces (inter-token whitespace is normalized
    for modified docs only; matching stays case-insensitive because the
    fingerprints hash the lowered copy, but reconstruction never does).

    The canonical pick is one min-struct aggregate per hot fingerprint
    (map-side combinable — no occurrence-pair join), and span merging is
    per-doc windows, so the shape matches duplicated_spans. Reconstruction
    concatenates the gap slices BETWEEN the sorted disjoint spans —
    O(tokens + spans) per doc, never tokens × spans (a dense adversarial
    doc with ~10⁴ spans stays linear; see the dense-span test)."""
    # original-cased token array for reconstruction; the lowered copy is
    # only ever hashed inside _windows (positions align: both split \s+)
    docs = df.select(
        F.col(id_col),
        F.col(text_col).alias("_orig"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_w"),
    )
    wins = _windows(df, n, text_col, id_col, portable=False)
    occ = (
        wins.groupBy("_wh")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
                "_first"
            ),
        )
        .where(F.col("_c") >= 2)
        .select("_wh", "_first")
    )
    # non-canonical occurrences of hot windows -> spans to strike
    strike = (
        wins.join(occ, on="_wh")
        .where(
            (F.col(id_col) != F.col("_first.i"))
            | (F.col("pos") != F.col("_first.p"))
        )
        .select(id_col, F.col("pos").alias("_s"), (F.col("pos") + n).alias("_e"))
    )
    wd = Window.partitionBy(id_col).orderBy("_s")
    prev_max_e = F.max("_e").over(wd.rowsBetween(Window.unboundedPreceding, -1))
    island = F.sum(
        F.when(prev_max_e.isNull() | (F.col("_s") > prev_max_e), 1).otherwise(0)
    ).over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans = (
        strike.withColumn("_isl", island)
        .groupBy(id_col, "_isl")
        .agg(F.min("_s").alias("s"), F.max("_e").alias("e"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("_cut"))
    )
    # spans are merged-maximal per doc (islands), so after array_sort they
    # are sorted AND disjoint: surviving tokens are exactly the gap slices
    # between consecutive spans (plus head before the first and tail after
    # the last) — one slice per span + 1, O(tokens + spans) per doc.
    cut = F.array_sort(F.col("_cut"))
    n_spans = F.size(cut)
    w = F.col("_w")

    def gap(j):
        start = F.when(j == 0, F.lit(0)).otherwise(F.element_at(cut, j)["e"])
        end = F.when(j == n_spans, F.size(w)).otherwise(
            F.element_at(cut, j + 1)["s"]
        )
        return F.slice(w, start + 1, F.greatest(end - start, F.lit(0)))

    kept_words = F.flatten(F.transform(F.sequence(F.lit(0), n_spans), gap))
    joined = docs.join(spans, on=id_col, how="left")
    return joined.select(
        F.col(id_col),
        F.when(F.col("_cut").isNull(), F.col("_orig"))
        .otherwise(F.array_join(kept_words, " "))
        .alias(text_col),
    )
