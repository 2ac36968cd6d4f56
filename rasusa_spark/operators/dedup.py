"""Deduplication operators for the training-data pipeline over ``documents``:

- exact       — hash-groupBy on a normalized content hash (one shuffle,
                map-side combinable; SQL-expressible → full DuckDB oracle)
- ngram-jaccard — word-shingle explode + self-join on shingle + group-count
                (pure DataFrame ops; SQL-expressible → full oracle)
- minhash-lsh — shingle → minhash signature → banded bucket join → verified
                candidate pairs (Arrow-vectorized signatures; the bucket
                join keeps the candidate set ~linear, never O(n²))
- simhash     — 64-bit simhash, banded into 4×16-bit chunks; pairs whose
                chunks collide get exact Hamming verification

Scale notes: every variant is shuffle-bounded by its bucket/shingle join —
no crossJoin anywhere; LSH band width tunes recall vs shuffle volume; at
100 TB the band tables are still (n_docs × n_bands) skinny rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import content_hash

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents:
    (content_hash, n_dups, keep_id) for groups with >1 member."""
    return (
        df.select(F.col(id_col), content_hash(F.col(text_col)).alias("chash"))
        .groupBy("chash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Retain one representative (min id) per content hash."""
    w_keep = (
        df.select(F.col(id_col), content_hash(F.col(text_col)).alias("chash"))
        .groupBy("chash")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_keep.select(id_col), on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# n-gram Jaccard (exact, SQL-expressible)
# --------------------------------------------------------------------------


def word_shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document (explode over a sliding
    window of the token array — JVM-side transform/slice, no Python).

    The split/normalize expression is materialized as a column FIRST:
    referencing the raw expression inside the per-gram ``transform`` lambda
    would inline (and re-execute) the regexp+split once per gram — measured
    ~30x slower on 50-word docs."""
    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    with_words = df.select(F.col(id_col), words_expr.alias("_words")).where(
        F.size("_words") >= n
    )
    words = F.col("_words")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return with_words.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_filter: bool | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram shingle sets. Returns
    (id_a, id_b, jaccard ≥ t) — identical results on both paths:

    - ``prefix_filter=True`` (the high-threshold web-scale path):
      AllPairs-style prefix filtering (Bayardo et al., WWW'07): order every
      doc's shingles by global document frequency (rarest first); any pair
      with jaccard ≥ t MUST collide inside the first ⌊(1−t)·|X|⌋+1 shingles
      of each side, so candidates come from joining only those prefixes,
      then exact verification via array intersection. The prefix shrinks
      as t grows — at near-dup thresholds the join touches only rare
      shingles.
    - ``prefix_filter=False``: full shingle self-join + group counts —
      cheaper when t is low (the prefix would cover most of each doc).
    - default ``None``: auto — prefix filtering for t ≥ 0.5.
    """
    if prefix_filter is None:
        prefix_filter = threshold >= 0.5
    if prefix_filter:
        return _jaccard_prefix_filtered(df, n, threshold, text_col, id_col)
    # the shingle table feeds sizes + both join sides — persist so the plan
    # materializes it once instead of re-deriving per consumer
    sh = word_shingles(df, n, text_col, id_col).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def _jaccard_prefix_filtered(
    df: DataFrame, n: int, threshold: float, text_col: str, id_col: str
) -> DataFrame:
    from pyspark.sql import Window

    sh = word_shingles(df, n, text_col, id_col).persist()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (
        sh.join(dfreq, on="shingle")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("_df"), F.col("shingle"))
            ),
        )
        .withColumn("_sz", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    prefix = ranked.where(
        F.col("_rn") <= F.floor(F.lit(1.0 - threshold) * F.col("_sz")) + 1
    ).select(id_col, "shingle")

    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sets = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_set("shingle")).alias("_sh"),
        F.count(F.lit(1)).alias("_sz"),
    )
    out = (
        cand.join(
            sets.select(
                F.col(id_col).alias("id_a"),
                F.col("_sh").alias("_sh_a"),
                F.col("_sz").alias("sz_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"),
                F.col("_sh").alias("_sh_b"),
                F.col("_sz").alias("sz_b"),
            ),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("_sh_a", "_sh_b")))
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash64(s: str) -> int:
    """Deterministic 64-bit string hash at C speed (blake2b short digest) —
    the per-shingle/per-word hot path of the signature builders."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8", "ignore"), digest_size=8).digest(), "little"
    )


def _minhash_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    n_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc minhash signature (array<long>, length n_perm) over word
    shingles, vectorized in one Arrow batch per group of rows."""
    a_coef, b_coef = _minhash_params(n_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(shingle_lists: pd.Series) -> pd.Series:
        out = []
        for shingles in shingle_lists:
            if shingles is None or len(shingles) == 0:
                out.append([int(_MERSENNE)] * n_perm)
                continue
            # stable 64-bit shingle hashes, then n_perm affine maps
            hs = np.array([_hash64(s) for s in shingles], dtype=np.uint64).astype(
                np.int64
            )
            hs = np.abs(hs) % _MERSENNE
            vals = (hs[None, :] * a_coef[:, None] + b_coef[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).tolist())
        return pd.Series(out)

    # shingle sets built in one Arrow pass (no oracle constrains the minhash
    # path, so Python string ops beat the per-gram JVM slice here)
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def shingle_set(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            words = " ".join(t.lower().split()).split(" ")
            if len(words) < shingle_n:
                out.append([])
                continue
            out.append(
                list(
                    {
                        " ".join(words[i : i + shingle_n])
                        for i in range(len(words) - shingle_n + 1)
                    }
                )
            )
        return pd.Series(out)

    shingled = df.select(
        F.col(id_col), shingle_set(F.col(text_col)).alias("shingles")
    ).where(F.size("shingles") > 0)
    return shingled.select(id_col, sig(F.col("shingles")).alias("signature"))


def _fnv64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in data:
        h = ((h ^ byte) * 0x100000001B3) & ((1 << 64) - 1)
    return h


def minhash_lsh_pairs(
    df: DataFrame,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over minhash
    signatures, verified by estimated Jaccard (signature agreement rate).
    Returns (id_a, id_b, est_jaccard ≥ threshold)."""
    rows_per_band = n_perm // n_bands
    sigs = minhash_signatures(df, n_perm, shingle_n, seed, text_col, id_col).cache()

    bands = sigs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("signature"), bnd * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "bucket"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    verified = (
        cand.join(sigs.withColumnRenamed(id_col, "id_a").withColumnRenamed("signature", "sig_a"), "id_a")
        .join(sigs.withColumnRenamed(id_col, "id_b").withColumnRenamed("signature", "sig_b"), "id_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda p, q: (p == q).cast("int")),
                    lambda v: v == 1,
                )
            )
            / F.lit(float(n_perm)),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return verified


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash over word hashes (sign-sum of per-bit votes)."""

    @F.pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            words = t.lower().split()
            if not words:
                continue
            hs = np.array([_hash64(w) for w in words], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.int64(
                np.bitwise_or.reduce(
                    np.where(votes > 0, np.uint64(1), np.uint64(0)) << np.arange(64, dtype=np.uint64)
                ).astype(np.int64)
            )
        return pd.Series(out)

    return df.select(id_col, sh(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming, candidates
    generated by 4×16-bit chunk collision (any chunk equal → candidate),
    verified exactly via bit_count(xor)."""
    sigs = simhash_signatures(df, text_col, id_col).cache()
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for i in range(4)
        ]
    )
    chunks = sigs.select(
        id_col, "simhash", F.explode(chunk_structs).alias("c")
    ).select(id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), on=["chunk", "val"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
