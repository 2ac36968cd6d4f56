"""Deduplication operators for the training-data pipeline over ``documents``:

- exact       — hash-groupBy on a normalized content hash (one shuffle,
                map-side combinable; SQL-expressible → full DuckDB oracle)
- ngram-jaccard — word-shingle explode + self-join on shingle + group-count
                (pure DataFrame ops; SQL-expressible → full oracle)
- minhash-lsh — shingle → minhash signature → banded bucket join → verified
                candidate pairs (signatures are pure JVM min-aggregates over
                xxhash64 permutations; the bucket join keeps the candidate
                set ~linear, never O(n²))
- simhash     — 64-bit simhash, banded into max_hamming+1 bit blocks (exact
                recall by pigeonhole); pairs whose blocks collide get exact
                Hamming verification

Scale notes: every variant is shuffle-bounded by its bucket/shingle join —
no crossJoin anywhere; LSH band width tunes recall vs shuffle volume; at
100 TB the band tables are still (n_docs × n_bands) skinny rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import content_hash

#: frames persisted by the dedup paths (per-doc aggregates, signatures),
#: pending release — mirrors downsample._THRESHOLD_CACHES so long-lived
#: sessions can reclaim blocks once results are materialized.
_DEDUP_CACHES: list[DataFrame] = []


def release_dedup_caches() -> None:
    """Unpersist every cached frame the dedup operators registered since the
    last release. Safe once results are materialized; calling early costs a
    recompute, never correctness."""
    while _DEDUP_CACHES:
        _DEDUP_CACHES.pop().unpersist()


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


def line_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-level duplicate-LINE removal (the RefinedWeb/CCNet boilerplate
    pass): every distinct non-blank line survives exactly once, at its first
    occurrence ordered by (doc_id, line position); all later copies are
    struck from their documents. Returns (id, text) for documents with ≥1
    surviving line, text rebuilt in original line order.

    Scale shape: one shuffle on the line value to pick first occurrences
    (``min(struct(id, pos))`` — map-side combinable, no window over the
    corpus), one shuffle back on the doc id to rebuild. Blank lines never
    enter the shuffle. A hot line ("Subscribe to our newsletter") is a
    single reduce key with ONE aggregated row out — the d² blowup a
    join-based formulation would hit cannot occur here."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).where(F.trim("line") != "")
    kept = (
        lines.groupBy("line")
        .agg(F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("_f"))
        .select(F.col("_f.i").alias(id_col), F.col("_f.p").alias("pos"), "line")
    )
    return (
        kept.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("_ls"))
        .select(
            F.col(id_col),
            F.array_join(
                F.transform("_ls", lambda s: s.getField("line")), "\n"
            ).alias(text_col),
        )
    )


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


def word_shingles_hashed(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingle HASHES per document ``(id, _shh)`` — the
    prefix-filter/minhash hot path. Never materializes shingle strings: each
    gram is one ``xxhash64`` over its n word columns, so the per-gram cost is
    a hash instead of an array_join string build plus a hash. Distinct grams
    ↔ distinct hashes up to 64-bit collisions (~2⁻⁶⁴ per gram pair), the
    same contract the hashed verification path already documents."""
    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    with_words = df.select(F.col(id_col), words_expr.alias("_words")).where(
        F.size("_words") >= n
    )
    w = F.col("_words")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.xxhash64(*[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    return with_words.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("_shh")
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
    - ``prefix_filter=False``: full shingle self-join + group counts — has
      NO hot-shingle guard (a stop-shingle with document frequency d puts d²
      rows on one join key), so it is the verification baseline, not the
      scale path.
    - default ``None``: route by threshold. At t ≥ 0.5 the prefix cut
      ⌊(1−t)·|X|⌋+1 is short and candidates are few → prefix filtering.
      At low t the prefix covers most of every doc, so nearly all
      co-occurring pairs become candidates anyway and the cost
      concentrates in the O(candidates)-group pair aggregate plus the
      verification joins (r7 at sf1: 42 M candidate pairs for 2.5 k
      survivors); there ``_jaccard_block_sparse`` does the same exact
      Σ df² intersection counting inside a numpy kernel per block-pair
      task — no candidate table, no pair hash aggregate, no
      verification join (33.3 s → 6-8 s at sf1).
    """
    if prefix_filter is None:
        if threshold >= 0.5:
            return _jaccard_prefix_filtered(df, n, threshold, text_col, id_col)
        return _jaccard_block_sparse(df, n, threshold, text_col, id_col)
    if prefix_filter:
        return _jaccard_prefix_filtered(df, n, threshold, text_col, id_col)
    # the shingle table feeds sizes + both join sides — persist so the plan
    # materializes it once instead of re-deriving per consumer
    sh = word_shingles(df, n, text_col, id_col).persist()
    _DEDUP_CACHES.append(sh)
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


def _ranked_doc_sets(shh: DataFrame, id_col: str) -> DataFrame:
    """Per-doc shingle sets ordered rarest-first:
    ``(id, _lst: array<struct<_df,_shh>>, _sz)``.

    ONE groupBy(id) aggregate feeds both the prefix explode and the exact
    verification sets — round 2's first cut ran a ``row_number`` window
    (an extra full-shingle shuffle + sort) AND a separate ``collect_set``
    aggregate for verification; ``array_sort(collect_list(struct(_df,_shh)))``
    gives the identical rarest-first order (struct comparison is
    lexicographic) in the same pass that builds the sets."""
    dfreq = shh.groupBy("_shh").agg(F.count(F.lit(1)).alias("_df"))
    return (
        shh.join(dfreq, on="_shh")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("_df", "_shh"))).alias("_lst"),
            F.count(F.lit(1)).alias("_sz"),
        )
    )


def _prefix_candidates_from_docs(
    docs: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    """AllPairs candidate generation with the PPJoin positional filter
    (Bayardo WWW'07; Xiao et al. WWW'08) over ``_ranked_doc_sets`` output:
    every doc's shingles are ordered by global document frequency (rarest
    first); any pair with jaccard ≥ t MUST collide inside the first
    ⌊(1−t)·|X|⌋+1 shingles of each side, so candidates come from self-joining
    only those prefixes. Hot stop-shingles rank LAST so they fall outside
    every prefix cut — the df-skew guard the naive self-join lacks.

    Positional filter (exact): at the pair's FIRST shared prefix position
    (r_a, r_b), the intersection can never exceed 1 + min(|A|−r_a, |B|−r_b);
    jaccard ≥ t needs |A∩B| ≥ ⌈t·(|A|+|B|)/(1+t)⌉, so pairs whose positional
    upper bound misses that are dropped BEFORE the expensive set-
    verification join. Size filter t·|B| ≤ |A| is implied by the same bound."""
    plen = (F.floor(F.lit(1.0 - threshold) * F.col("_sz")) + 1).cast("int")
    prefix = docs.select(
        F.col(id_col), F.col("_sz"), F.posexplode(F.slice("_lst", F.lit(1), plen))
    ).select(
        id_col,
        "_sz",
        (F.col("pos") + 1).alias("_rn"),
        F.col("col._shh").alias("_shh"),
    )
    paired = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="_shh")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(
            F.min("a._rn").alias("_ra"),
            F.min("b._rn").alias("_rb"),
            F.first("a._sz").alias("_sa"),
            F.first("b._sz").alias("_sb"),
        )
    )
    alpha = F.ceil(F.lit(threshold) * (F.col("_sa") + F.col("_sb")) / F.lit(1.0 + threshold))
    ubound = F.lit(1) + F.least(F.col("_sa") - F.col("_ra"), F.col("_sb") - F.col("_rb"))
    return paired.where(ubound >= alpha).select("id_a", "id_b")


def _gram_sets_kernel(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, _sh array<long>): each doc's DISTINCT word n-gram shingle
    hashes as one array, built in a mapInArrow kernel
    (functions/npxxh.py) — bit-equal VALUES to
    ``array_distinct(transform(sequence(...), i -> xxhash64(w[i..i+n-1])))``
    (property-tested string-XXH64 chain; consumers are set-semantic, the
    array order is sorted rather than first-occurrence). Replaces the
    interpreted per-position JVM HOF in the block-sparse jaccard path."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    from rasusa_spark.functions import npxxh

    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    base = (
        df.select(F.col(id_col), words_expr.alias("_words"))
        .where(F.size("_words") >= n)
        .repartition(F.col(id_col))
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("_sh", T.ArrayType(T.LongType())),
        ]
    )
    nn = int(n)

    def kern(batches):
        old = np.seterr(over="ignore")
        try:
            for batch in batches:
                m = batch.num_rows
                if m == 0:
                    continue
                doc_ix, fp, _ = npxxh.window_gram_hashes(
                    batch.column("_words"), nn
                )
                di, fo, counts = npxxh.distinct_per_doc(doc_ix, fp)
                offs = np.zeros(m + 1, dtype=np.int64)
                offs[1:] = np.cumsum(counts[:m])
                arr = pa.ListArray.from_arrays(
                    pa.array(offs.astype(np.int32), pa.int32()),
                    pa.array(fo.view(np.int64), pa.int64()),
                )
                yield pa.record_batch(
                    [batch.column(id_col), arr], names=[id_col, "_sh"]
                )
        finally:
            np.seterr(**old)

    return base.mapInArrow(kern, out_schema)


def _jaccard_block_sparse(
    df: DataFrame,
    n: int,
    threshold: float,
    text_col: str,
    id_col: str,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact Jaccard via block-pair co-occurrence counting (the
    low-threshold path). At t < 0.5 the prefix cut ⌊(1−t)|X|⌋+1 covers
    most of every doc, so the prefix join + its O(candidate)-group pair
    aggregate dominate (r7 measurement at sf1: 42 M candidate pairs for
    2.5 k survivors, 16 s in the aggregate alone). This path does the
    same Σ_s df_s² exact intersection work inside numpy instead of a
    42 M-group hash aggregate:

    - the per-doc DISTINCT shingle-hash array comes from ONE projection
      (no explode, no groupBy, no shuffle of shingle rows);
    - docs are hashed into ``n_blocks`` deterministic blocks
      (pmod(xxhash64(id), K) — layout-invariant) and each doc is
      replicated to its K block-pairs, so every unordered doc pair is
      co-located in exactly one task;
    - each task sorts its flattened (hash, doc) table, emits the
      within-shingle-group pairs with a vectorized repeat/arange
      construction, counts exact intersections with one np.unique, and
      applies the identical ``inter/(sz_a+sz_b−inter) ≥ t`` predicate
      (same IEEE doubles as the JVM division) + round-6 half-up.

    Scale envelope: shuffle = K × the skinny set table, tasks =
    K(K+1)/2; size K so two blocks of sets fit a task. Beyond corpora
    where K stays moderate (K² task count), the prefix path remains the
    asymptotic fallback — at the high thresholds where it is selective
    it is also the cheaper one, hence the routing in
    ``ngram_jaccard_pairs``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # per-doc distinct gram-hash arrays from the npxxh kernel — the SAME
    # hash values as the former JVM n-ary transform (bit-exact string
    # XXH64 chain), without its per-position interpreted HOF cost
    sets = _gram_sets_kernel(df, n, text_col, id_col).withColumn(
        "_blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    )
    bp = F.explode(
        F.array(
            *[
                F.struct(
                    F.least(F.col("_blk"), F.lit(j)).alias("_b1"),
                    F.greatest(F.col("_blk"), F.lit(j)).alias("_b2"),
                )
                for j in range(n_blocks)
            ]
        )
    )
    rep = sets.select(id_col, "_sh", "_blk", bp.alias("_bp")).select(
        id_col, "_sh", "_blk", F.col("_bp._b1").alias("_b1"), F.col("_bp._b2").alias("_b2")
    )

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    thr = float(threshold)

    def block_pairs(key, tbl):
        """Arrow-native kernel: the list column flattens zero-copy via the
        ListArray values/offsets buffers (a pandas kernel would box every
        shingle hash into a Python int — measured as the dominant cost).
        Cross tasks emit ONLY a-side × b-side pairs and diagonal tasks
        only within-block pairs, so every unordered doc pair is emitted
        exactly once across the whole job (global emissions = Σ C(df,2))
        and no post-hoc block filter is needed. Doc indices stay int32
        and pair keys use the narrowest dtype that fits m² — on this
        memory-bound host the kernel cost is bytes touched, not flops."""
        import pyarrow as pa

        b1, b2 = int(key[0].as_py()), int(key[1].as_py())
        m = len(tbl)
        ids = tbl.column(id_col).combine_chunks()
        empty = pa.table(
            {
                "id_a": ids.slice(0, 0),
                "id_b": ids.slice(0, 0),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if m < 2:
            return empty
        blks = tbl.column("_blk").to_numpy()
        cross = b1 != b2
        if cross:
            # a-side docs first, so inside each hash group (stable sort)
            # the a elements precede the b elements
            doc_order = np.argsort(blks != b1, kind="stable").astype(np.int32)
            tbl = tbl.take(pa.array(doc_order))
            ids = tbl.column(id_col).combine_chunks()
            na = int((blks == b1).sum())
        sh = tbl.column("_sh").combine_chunks()
        offs = sh.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)
        flat = sh.values.to_numpy()
        didx = np.repeat(np.arange(m, dtype=np.int32), lens)
        order = np.argsort(flat, kind="stable")
        d = didx[order]
        h = flat[order]
        nf = len(h)
        new = np.r_[True, h[1:] != h[:-1]]
        starts = np.flatnonzero(new)
        grp = (np.cumsum(new) - 1).astype(np.int64)
        gsz = np.diff(np.r_[starts, nf])
        if cross:
            # per group: a elements occupy [start, b_start), b the rest
            is_b = d >= na
            nb_g = np.add.reduceat(is_b.astype(np.int64), starts)
            b_start = starts + (gsz - nb_g)
            a_pos = np.flatnonzero(~is_b)
            reps = nb_g[grp[a_pos]]
            nz = reps > 0
            a_pos, reps = a_pos[nz], reps[nz]
            total = int(reps.sum())
            if total == 0:
                return empty
            left = np.repeat(a_pos, reps)
            cum = np.cumsum(reps)
            right = np.arange(total, dtype=np.int64) - np.repeat(cum - reps, reps)
            right += np.repeat(b_start[grp[a_pos]], reps)
        else:
            gend = starts[grp] + gsz[grp]
            reps = gend - np.arange(nf) - 1
            total = int(reps.sum())
            if total == 0:
                return empty
            left = np.repeat(np.arange(nf, dtype=np.int64), reps)
            cum = np.cumsum(reps)
            right = np.arange(total, dtype=np.int64) - np.repeat(cum - reps, reps)
            right += left + 1
        da, db = d[left], d[right]
        if m < 46341:  # m*m fits int32: halve the sort's memory traffic
            kdt = np.int32
        else:
            kdt = np.int64
        pkey = da.astype(kdt) * kdt(m) + db.astype(kdt)
        pkey.sort(kind="stable")
        bnd = np.r_[True, pkey[1:] != pkey[:-1]]
        uk = pkey[bnd].astype(np.int64)
        inter = np.diff(np.r_[np.flatnonzero(bnd), len(pkey)])
        dl = uk // m
        dh = uk - dl * m
        sa, sb = lens[dl], lens[dh]
        jac = inter / (sa + sb - inter)
        keep = jac >= thr
        ia = ids.take(pa.array(dl[keep])).to_numpy(zero_copy_only=False)
        ib = ids.take(pa.array(dh[keep])).to_numpy(zero_copy_only=False)
        # output contract: id_a < id_b by id VALUE
        id_lo = np.minimum(ia, ib)
        id_hi = np.maximum(ia, ib)
        return pa.table(
            {
                "id_a": pa.array(id_lo, ids.type),
                "id_b": pa.array(id_hi, ids.type),
                "jaccard": pa.array(np.floor(jac[keep] * 1e6 + 0.5) / 1e6),
            }
        )

    return rep.groupBy("_b1", "_b2").applyInArrow(block_pairs, out_schema)


def _prefix_candidates(shh: DataFrame, threshold: float, id_col: str) -> DataFrame:
    """Candidate pairs straight from a hashed shingle table ``(id, _shh)`` —
    thin wrapper building the ranked doc sets first (kept for tests and
    callers that already have the exploded table)."""
    return _prefix_candidates_from_docs(
        _ranked_doc_sets(shh, id_col), threshold, id_col
    )


def _jaccard_prefix_filtered(
    df: DataFrame, n: int, threshold: float, text_col: str, id_col: str
) -> DataFrame:
    """Prefix-filtered exact Jaccard. Everything downstream of shingle
    generation runs on 64-bit shingle hashes, not strings — candidate join
    keys, verification sets, and sizes are all 8 B/element. Distinct
    shingles map to distinct hashes up to xxhash64 collisions (~2⁻⁶⁴ per
    shingle pair — below any realistic corpus's noise floor); a collision
    inside one doc pair's union would overcount the intersection by 1.

    Only the per-doc aggregate (one skinny row per doc) is persisted — it
    feeds the prefix explode, the positional filter, AND both verification
    sides. The exploded shingle table itself is never cached: at 100 TB it
    is larger than the input, and recomputing its map-side scan twice (df
    counts + the rank join) is cheaper than spilling it."""
    shh = word_shingles_hashed(df, n, text_col, id_col)
    docs = _ranked_doc_sets(shh, id_col).persist()
    _DEDUP_CACHES.append(docs)
    cand = _prefix_candidates_from_docs(docs, threshold, id_col)
    sets = docs.select(
        F.col(id_col),
        F.transform("_lst", lambda s: s["_shh"]).alias("_sh"),
        F.col("_sz"),
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


def minhash_signatures(
    df: DataFrame,
    n_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc minhash signature (array<long>, length n_perm) over word
    shingles — 100 % JVM-side (whole-stage codegen, zero Python):

    - shingles come from the exploded ``word_shingles_hashed`` table (one
      xxhash64 per gram, no shingle strings), re-keyed with the seed;
    - the permutation family is derived by re-hashing the 64-bit value with
      ``xxhash64(h, i)`` per permutation index (hashing 8 bytes, not the
      string, per permutation);
    - the signature is ``n_perm`` ``min()`` aggregates in ONE groupBy —
      partial-aggregated map-side, so the shuffle carries one n_perm-wide
      row per doc, never the shingle table.

    min over a pairwise-independent-ish hash family is the standard minhash
    estimator (Broder '97); round 1 built the same estimator through a
    per-shingle Python hashlib loop — the top CPU cost of the whole bench
    (VERDICT r1 "What's wrong" #3).

    r7: gram hashes still come from ONE JVM projection (xxhash64 over the
    word columns — string hashing stays in codegen), but the permutation
    family + per-doc minima run in a vectorized numpy XXH64 kernel
    (mapInArrow): the (long, long) chain and the (long, int-literal)
    chain of Spark's xxhash64 are reimplemented bit-exactly on uint64
    arrays (property-tested against Spark over random longs in
    tests/test_pipeline_ops.py), 64 per-permutation finalizers + signed
    per-doc reduceat minima replace the shingle-row explode, its shuffle
    and the 64-min hash aggregate. Signatures are BIT-IDENTICAL to the
    former builder by construction and by test."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    with_words = df.select(F.col(id_col), words_expr.alias("_words")).where(
        F.size("_words") >= shingle_n
    )
    w = F.col("_words")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - shingle_n),
        lambda i: F.xxhash64(
            *[F.element_at(w, i + j + 1) for j in range(shingle_n)]
        ),
    )
    # hash-repartition so the kernel parallelizes past the scan's file
    # split count (a single sf1 parquet file is ONE scan partition)
    sets = with_words.select(
        F.col(id_col), F.array_distinct(grams).alias("_sh")
    ).repartition(F.col(id_col))

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("signature", T.ArrayType(T.LongType())),
        ]
    )
    seed_l = int(seed)
    np_ = n_perm

    def sig_kernel(batches):
        P1 = np.uint64(0x9E3779B185EBCA87)
        P2 = np.uint64(0xC2B2AE3D27D4EB4F)
        P3 = np.uint64(0x165667B19E3779F9)
        P4 = np.uint64(0x85EBCA77C2B2AE63)
        P5 = np.uint64(0x27D4EB2F165667C5)
        c64 = np.uint64(64)

        def rotl(x, r):
            r = np.uint64(r)
            return (x << r) | (x >> (c64 - r))

        def fmix(h):
            h = h ^ (h >> np.uint64(33))
            h = h * P2
            h = h ^ (h >> np.uint64(29))
            h = h * P3
            h = h ^ (h >> np.uint64(32))
            return h

        def hash_long(l_u64, seed_u64):
            h = seed_u64 + P5 + np.uint64(8)
            h = h ^ (rotl(l_u64 * P2, 31) * P1)
            h = rotl(h, 27) * P1 + P4
            return fmix(h)

        def hash_int(i, seed_u64):
            h = seed_u64 + P5 + np.uint64(4)
            h = h ^ (np.uint64(i & 0xFFFFFFFF) * P1)
            h = rotl(h, 23) * P2 + P3
            return fmix(h)

        old = np.seterr(over="ignore")
        try:
            # seed's int64 bit pattern as uint64 (two's complement)
            base = hash_long(
                np.uint64(seed_l & 0xFFFFFFFFFFFFFFFF), np.uint64(42)
            )
            for batch in batches:
                m = batch.num_rows
                if m == 0:
                    continue
                sh = batch.column("_sh")
                offs = sh.offsets.to_numpy().astype(np.int64)
                flat = sh.values.to_numpy().view(np.uint64)
                # seed re-hash chain: xxhash64(lit(seed)::long, _shh)
                h = hash_long(flat, base)
                # shared prefix of every permutation: hashLong(_h, 42)
                h1 = hash_long(h, np.uint64(42))
                starts = offs[:-1]
                sig = np.empty((m, np_), dtype=np.int64)
                for i in range(np_):
                    v = hash_int(i, h1).view(np.int64)
                    sig[:, i] = np.minimum.reduceat(v, starts)
                out_offs = (np.arange(m + 1, dtype=np.int32) * np_)
                values = pa.array(sig.reshape(-1), pa.int64())
                sig_arr = pa.ListArray.from_arrays(
                    pa.array(out_offs, pa.int32()), values
                )
                yield pa.record_batch(
                    [batch.column(id_col), sig_arr], names=[id_col, "signature"]
                )
        finally:
            np.seterr(**old)

    return sets.mapInArrow(sig_kernel, out_schema)


def minhash_signatures_oph(
    df: DataFrame,
    n_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-permutation minhash (Li, Owen, Zhang NIPS'12) with cyclic
    rotation densification (Shrivastava & Li ICML'14) — the 100-TB scale
    path for signature building:

    - ONE xxhash64 per shingle (the classic builder re-hashes every shingle
      ``n_perm`` times — at 10¹² docs those 64 hashes/shingle are the
      dominant pipeline CPU);
    - the hash value's residue mod ``n_perm`` picks a bin; per-bin minima
      are ``n_perm`` conditional ``min()`` aggregates in one map-side-
      combinable groupBy (comparisons, not hashes, per row);
    - empty bins borrow the next non-empty bin's value cyclically —
      densification keeps the collision-probability estimator unbiased.
      The rotation runs JVM-side in ⌈log₂ n_perm⌉ coalesce rounds over
      rotated copies of the signature array (doubling offsets 1,2,4,…), so
      there is zero Python anywhere in the builder.

    Signatures from this builder and the classic one estimate the SAME
    Jaccard but are not bitwise comparable — use one builder consistently
    within a table."""
    sh = word_shingles_hashed(df, shingle_n, text_col, id_col)
    hashed = sh.select(
        F.col(id_col),
        F.xxhash64(F.lit(int(seed)).cast("long"), F.col("_shh")).alias("_h"),
    ).withColumn("_bin", F.pmod(F.col("_h"), F.lit(n_perm)).cast("int"))
    mins = hashed.groupBy(id_col).agg(
        *[
            F.min(F.when(F.col("_bin") == i, F.col("_h"))).alias(f"_m{i}")
            for i in range(n_perm)
        ]
    )
    # densify: offset-doubling cyclic fill — after rounds with shifts
    # 1,2,4,... every bin holds the value of the nearest non-empty bin to
    # its right (cyclically); ≥1 shingle per doc guarantees a non-empty bin.
    # One projection per round keeps each round referencing a named column,
    # not an inlined expression tree (which would triple per round).
    out = mins.select(
        F.col(id_col),
        F.array(*[F.col(f"_m{i}") for i in range(n_perm)]).alias("_sig"),
    )
    shift = 1
    while shift < n_perm:
        s = F.col("_sig")
        rotated = F.concat(
            F.slice(s, shift + 1, n_perm - shift), F.slice(s, 1, shift)
        )
        out = out.withColumn(
            "_sig", F.zip_with(s, rotated, lambda a, b: F.coalesce(a, b))
        )
        shift *= 2
    return out.select(F.col(id_col), F.col("_sig").alias("signature"))


def signature_bands(
    sigs: DataFrame,
    n_perm: int,
    n_bands: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded LSH bucket table from a (id, signature) table: one
    (id, band, bucket) row per band, bucket = xxhash64 over the band's
    slice of the signature. Factored out of ``minhash_lsh_pairs`` so the
    incremental path (streaming/dedup_inc.py) bands new signatures with
    the EXACT same expression — bit-equal buckets are what make
    incremental pairs == batch pairs."""
    rows_per_band = n_perm // n_bands
    return sigs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    F.col("signature"),
                                    bnd * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def signature_agreement(sig_a, sig_b, n_perm: int):
    """Estimated Jaccard = fraction of agreeing signature positions —
    the ONE expression both the batch verifier and the incremental path
    use (bit-equal doubles)."""
    return F.size(
        F.filter(
            F.zip_with(sig_a, sig_b, lambda p, q: (p == q).cast("int")),
            lambda v: v == 1,
        )
    ) / F.lit(float(n_perm))


def minhash_lsh_pairs(
    df: DataFrame,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    one_perm: bool = False,
    verify_exact: bool = False,
    est_prefilter_margin: float | None | str = "auto",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over minhash
    signatures, verified by estimated Jaccard (signature agreement rate).
    Returns (id_a, id_b, est_jaccard ≥ threshold). ``one_perm=True``
    switches the signature builder to one-permutation hashing with
    densification (1 hash/shingle instead of n_perm — the 100-TB path).

    ``verify_exact=True`` is the production dedup recipe (LSH prune, exact
    confirm): candidates come from the band join, then each candidate pair
    is verified against EXACT shingle-set Jaccard and the output is
    (id_a, id_b, jaccard ≥ threshold). The exact pass touches only
    candidate docs (semi-join before shingling), so its cost is
    O(candidates), not O(corpus) — signatures stay the only corpus-wide
    scan.

    ``est_prefilter_margin`` (verify_exact only): before the exact pass,
    candidates are screened on signature agreement ≥ threshold − margin —
    a join against the already-cached skinny signature table. High-recall
    bandings (e.g. 32 bands × 2 rows) admit most moderate-jaccard pairs as
    candidates (at j=0.2 a pair collides on some 2-row band with p≈0.73);
    without the screen every one of them pays shingle-set verification.
    Recall cost is quantified: a true pair AT j=t has agreement
    ~Binomial(n_perm, t)/n_perm, so at t=0.5, n_perm=64, margin=0.25 the
    screen misses with P[X<16] ≈ 3e-5 — below the 1e-4 banding miss it
    stacks with.

    Default ``"auto"`` (VERDICT r3 #1): the screen turns ON at margin
    0.25 exactly when the banding is high-recall (rows_per_band ≤ 2) and
    ``verify_exact`` is set — those bandings admit moderate-jaccard pairs
    with near-certainty (p = 1−(1−j²)^32 ≈ 0.95 at j=0.3 for 32×2), so on
    any boilerplate-heavy corpus candidate verification, not the signature
    scan, dominates; the screen is a join against the already-cached
    skinny signature table and bounds that volume. Pass ``None`` to force
    it off (recall = pure banding recall) or a float to set the margin
    explicitly. Measured at sf1 (BENCH/BASELINE.md): auto-on cuts the
    32×2 verify-exact wall from ~18.5 s toward r2's 16×4 parity."""
    rows_per_band = n_perm // n_bands
    if est_prefilter_margin == "auto":
        est_prefilter_margin = 0.25 if (verify_exact and rows_per_band <= 2) else None
    build = minhash_signatures_oph if one_perm else minhash_signatures
    sigs = build(df, n_perm, shingle_n, seed, text_col, id_col).cache()
    _DEDUP_CACHES.append(sigs)

    bands = signature_bands(sigs, n_perm, n_bands, id_col)

    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "bucket"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    if verify_exact:
        if est_prefilter_margin is not None:
            est_cut = max(0.0, threshold - est_prefilter_margin)
            agree = signature_agreement(F.col("_siga"), F.col("_sigb"), n_perm)
            cand = (
                cand.join(
                    sigs.select(
                        F.col(id_col).alias("id_a"), F.col("signature").alias("_siga")
                    ),
                    "id_a",
                )
                .join(
                    sigs.select(
                        F.col(id_col).alias("id_b"), F.col("signature").alias("_sigb")
                    ),
                    "id_b",
                )
                .where(agree >= est_cut)
                .select("id_a", "id_b")
            )
        # cand feeds BOTH cand_ids (semi-join) and the final pair join:
        # un-materialized it would recompute the band join (+ screen joins)
        # per consumer — the shared-subtree plan trap (CLAUDE.md). Persist
        # the skinny (id_a, id_b) set once; released via release_dedup_caches.
        cand = cand.persist()
        _DEDUP_CACHES.append(cand)
        cand_ids = (
            cand.select(F.col("id_a").alias(id_col))
            .union(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        # no broadcast hint: on a high-duplication corpus the candidate id
        # set is unbounded and a forced broadcast is a driver OOM at 100 TB;
        # AQE picks broadcast on its own whenever the set is actually small
        # (verified in PLANS.md — the sf0.1 plan still shows a broadcast).
        # semi-join BEFORE shingling: the gram transform+explode is the
        # expensive part and Catalyst cannot push a join below Generate,
        # so shingle only the candidate docs (r7; identical sets — the
        # semi-join commutes with per-doc shingling)
        sets = (
            word_shingles_hashed(
                df.join(cand_ids, id_col, "left_semi"),
                shingle_n,
                text_col,
                id_col,
            )
            .groupBy(id_col)
            .agg(F.collect_set("_shh").alias("_set"))
        )
        return (
            cand.join(
                sets.select(F.col(id_col).alias("id_a"), F.col("_set").alias("_sa")),
                "id_a",
            )
            .join(
                sets.select(F.col(id_col).alias("id_b"), F.col("_set").alias("_sb")),
                "id_b",
            )
            .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
            .withColumn(
                "jaccard",
                F.col("_i") / (F.size("_sa") + F.size("_sb") - F.col("_i")),
            )
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )
    verified = (
        cand.join(sigs.withColumnRenamed(id_col, "id_a").withColumnRenamed("signature", "sig_a"), "id_a")
        .join(sigs.withColumnRenamed(id_col, "id_b").withColumnRenamed("signature", "sig_b"), "id_b")
        .withColumn(
            "est_jaccard",
            signature_agreement(F.col("sig_a"), F.col("sig_b"), n_perm),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return verified


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """64-bit simhash (sign-sum of per-bit votes over word hashes) — JVM-side:
    explode words, hash each once, then 64 ±1-vote ``sum()`` aggregates in
    one map-side-combinable groupBy; the signature is rebuilt by OR-ing the
    vote signs back into bit positions. Docs whose text has no words get
    simhash 0 (all votes empty), same as the round-1 Python path.

    ``portable=False`` (default) hashes words with ``xxhash64`` — the fast
    production family. ``portable=True`` builds the 64-bit word hash from
    the first 16 hex chars of ``md5(word)`` (two 32-bit halves assembled
    with bit ops, so nothing overflows ANSI arithmetic) — any SQL engine
    with ``md5`` can reproduce the signatures bit-for-bit, which is what
    the driver's DuckDB oracle does. The hash family only relabels the
    uniform 64-bit vote space; operator semantics are identical."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_w"),
    ).where(F.col("_w") != "")
    if portable:
        hi = F.conv(F.substring(F.md5("_w"), 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(F.md5("_w"), 9, 8), 16, 10).cast("long")
        word_hash = F.shiftleft(hi, 32).bitwiseOR(lo)
    else:
        word_hash = F.xxhash64("_w")
    hashed = words.select(F.col(id_col), word_hash.alias("_h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"_v{i}")
            for i in range(64)
        ]
    )
    sig = None
    for i in range(64):
        bit = F.shiftleft(
            F.when(F.col(f"_v{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i
        )
        sig = bit if sig is None else sig.bitwiseOR(bit)
    with_sig = votes.select(F.col(id_col), sig.alias("simhash"))
    # keep one row per input doc (wordless docs → simhash 0)
    return (
        df.select(id_col)
        .join(with_sig, on=id_col, how="left")
        .na.fill(0, ["simhash"])
    )


def _simhash_chunk_bounds(n_chunks: int) -> list[tuple[int, int]]:
    """Split the 64 signature bits into ``n_chunks`` contiguous blocks whose
    widths differ by at most one bit: returns (shift, width) per block."""
    base, extra = divmod(64, n_chunks)
    bounds = []
    shift = 0
    for i in range(n_chunks):
        width = base + (1 if i < extra else 0)
        bounds.append((shift, width))
        shift += width
    return bounds


def simhash_pairs_from_signatures(
    sigs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_chunks: int | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """All pairs with Hamming(sig_a, sig_b) ≤ ``max_hamming`` — EXACT recall.

    Candidates come from equal-block collision over ``n_chunks`` contiguous
    bit blocks. Pigeonhole: ≤ max_hamming differing bits spread over
    max_hamming+1 blocks leave at least one block identical, so
    ``n_chunks = max_hamming + 1`` (the default) guarantees every qualifying
    pair is a candidate; candidates are then verified exactly via
    bit_count(xor). This is the block-permutation scheme of Manku et al.
    (WWW'07) with one table per block.

    Scale note: the candidate volume per block is Σ_bucket n_bucket², with
    2^width buckets per block — width = 64 // n_chunks. Large ``max_hamming``
    ⇒ narrow blocks ⇒ more collisions, so at web scale keep the radius small
    (the standard 64-bit near-dup radius is 3, giving 16-bit blocks). Passing
    ``n_chunks < max_hamming + 1`` is rejected rather than silently losing
    recall (the round-1 defect this replaces).

    ``bucket_cap`` (opt-in) bounds the adversarial quadratic corner — a
    corpus where one bucket holds millions of members:

    - identical-signature groups larger than the cap collapse to STAR edges
      around the min-id representative (``(rep, member, hamming=0)``), and
      only the representative enters the banded join. Any outside doc within
      radius h of a member is within radius h of the representative (their
      signatures are identical), so the output's TRANSITIVE CLOSURE — which
      is what dedup_clusters consumes — is unchanged; what is elided is the
      Θ(n²) explicit clique, replaced by n−1 edges.
    - (chunk,val) buckets that still exceed the cap (block-value collisions
      between distinct signatures) get SECOND-LEVEL banding: members are
      re-banded on the byte-rotated signature into another max_hamming+1
      blocks and must also agree on one of those. Rotation is a bijection on
      bit positions, so a qualifying pair still has ≤ max_hamming diffs over
      the rotated blocks → one rotated block equal (pigeonhole again) —
      exact recall is preserved while the bucket is cut by ~2^sub_width.

    With ``bucket_cap=None`` (default) the output is the complete pair list
    and no extra shuffles run."""
    if n_chunks is None:
        n_chunks = max_hamming + 1
    if n_chunks < max_hamming + 1:
        raise ValueError(
            f"n_chunks={n_chunks} cannot guarantee recall at "
            f"max_hamming={max_hamming}; need ≥ max_hamming+1 blocks"
        )
    if n_chunks > 64:
        raise ValueError("n_chunks must be ≤ 64 (one bit per block minimum)")

    star = None
    if bucket_cap is not None:
        grp = sigs.groupBy(sig_col).agg(
            F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_rep")
        )
        tagged = sigs.join(grp, on=sig_col)
        star = tagged.where(
            (F.col("_n") > bucket_cap) & (F.col(id_col) != F.col("_rep"))
        ).select(
            F.col("_rep").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
        sigs = tagged.where(
            (F.col("_n") <= bucket_cap) | (F.col(id_col) == F.col("_rep"))
        ).select(id_col, sig_col)

    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col(sig_col), shift)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for i, (shift, width) in enumerate(_simhash_chunk_bounds(n_chunks))
        ]
    )
    chunks = sigs.select(
        id_col, sig_col, F.explode(chunk_structs).alias("c")
    ).select(id_col, sig_col, F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))

    join_keys = ["chunk", "val"]
    if bucket_cap is not None:
        counts = chunks.groupBy("chunk", "val").agg(F.count(F.lit(1)).alias("_bn"))
        rot = F.shiftrightunsigned(F.col(sig_col), 8).bitwiseOR(
            F.shiftleft(F.col(sig_col), 56)
        )
        sub_structs = F.array(
            *[
                F.struct(
                    F.lit(j).alias("sub"),
                    F.shiftrightunsigned(rot, shift)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("subval"),
                )
                for j, (shift, width) in enumerate(_simhash_chunk_bounds(n_chunks))
            ]
        )
        no_sub = F.array(
            F.struct(F.lit(-1).alias("sub"), F.lit(0).cast("long").alias("subval"))
        )
        chunks = (
            chunks.join(counts, on=["chunk", "val"])
            .select(
                id_col,
                sig_col,
                "chunk",
                "val",
                F.explode(
                    F.when(F.col("_bn") > bucket_cap, sub_structs).otherwise(no_sub)
                ).alias("s"),
            )
            .select(
                id_col,
                sig_col,
                "chunk",
                "val",
                F.col("s.sub").alias("sub"),
                F.col("s.subval").alias("subval"),
            )
        )
        join_keys = ["chunk", "val", "sub", "subval"]

    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), on=join_keys)
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.col(f"x.{sig_col}").alias("sh_a"),
            F.col(f"y.{sig_col}").alias("sh_b"),
        )
        .distinct()
    )
    out = (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return out.unionByName(star) if star is not None else out


def _shingle_set_kernel(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """Distinct word n-gram shingle hashes per doc ``(id, _shh)`` via the
    spans-style Arrow kernel (r7 continuation): ONE JVM xxhash64 per WORD,
    then a vectorized numpy chain fingerprints every stride-1 window and
    per-doc ``np.unique`` replaces ``array_distinct`` + explode. The
    family differs from ``word_shingles_hashed`` (chained XXH64 over word
    hashes vs one n-ary xxhash64) — use it only where BOTH sides of a
    comparison use it and only EQUALITY of shingles matters
    (``ngram_contamination``); minhash/prefix paths keep the n-ary family
    their signatures and oracles are pinned to. Set-identical up to
    64-bit collisions by the hashed-dedup contract; flagged outputs
    pinned vs the JVM form by ``test_contamination_kernel_matches_jvm``."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    wh = F.transform(words_expr, lambda x: F.xxhash64(x))
    base = (
        df.select(F.col(id_col), wh.alias("_h"))
        .where(F.size("_h") >= n)
        .repartition(F.col(id_col))
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("_shh", T.LongType()),
        ]
    )
    nn = int(n)

    def kern(batches):
        P1 = np.uint64(0x9E3779B185EBCA87)
        P2 = np.uint64(0xC2B2AE3D27D4EB4F)
        P3 = np.uint64(0x165667B19E3779F9)
        P4 = np.uint64(0x85EBCA77C2B2AE63)
        P5 = np.uint64(0x27D4EB2F165667C5)
        c64 = np.uint64(64)

        def rotl(x, r):
            r = np.uint64(r)
            return (x << r) | (x >> (c64 - r))

        def fmix(h):
            h = h ^ (h >> np.uint64(33))
            h = h * P2
            h = h ^ (h >> np.uint64(29))
            h = h * P3
            return h ^ (h >> np.uint64(32))

        def hash_long(l_u64, seed_u64):
            h = seed_u64 + P5 + np.uint64(8)
            h = h ^ (rotl(l_u64 * P2, 31) * P1)
            h = rotl(h, 27) * P1 + P4
            return fmix(h)

        old = np.seterr(over="ignore")
        try:
            for batch in batches:
                m = batch.num_rows
                if m == 0:
                    continue
                col = batch.column("_h")
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                offs = col.offsets.to_numpy().astype(np.int64)
                flat = col.values.to_numpy().view(np.uint64)
                lens = offs[1:] - offs[:-1]
                nw = lens - nn + 1
                starts = np.repeat(offs[:-1], nw)
                pos = np.arange(starts.size, dtype=np.int64) - np.repeat(
                    np.cumsum(nw) - nw, nw
                )
                s = starts + pos
                fp = np.full(s.size, 42, dtype=np.uint64)
                for j in range(nn):
                    fp = hash_long(flat[s + j], fp)
                # per-doc distinct: unique on (doc ordinal, fp) pairs
                doc_ix = np.repeat(np.arange(m, dtype=np.int64), nw)
                order = np.lexsort((fp, doc_ix))
                di, fo = doc_ix[order], fp[order]
                keep = np.empty(di.size, dtype=bool)
                keep[0] = True
                keep[1:] = (di[1:] != di[:-1]) | (fo[1:] != fo[:-1])
                ids = batch.column(id_col)
                if isinstance(ids, pa.ChunkedArray):
                    ids = ids.combine_chunks()
                yield pa.record_batch(
                    {
                        id_col: ids.take(pa.array(di[keep])),
                        "_shh": pa.array(fo[keep].view(np.int64)),
                    }
                )
        finally:
            np.seterr(**old)

    return base.mapInArrow(kern, out_schema)


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_probes: bool = True,
    kernel: bool = True,
) -> DataFrame:
    """Benchmark-contamination check: documents sharing ≥ ``min_shared``
    distinct word n-gram shingles with ANY probe document (the
    decontamination pass an LLM pipeline runs against eval benchmarks
    before training). Returns (doc_id, shared_shingles) for flagged docs.

    The probe shingle set is tiny (benchmarks are KBs–MBs, the corpus is
    TBs), so it broadcasts and the check is a map-side semi-join against
    the corpus shingle stream — no shuffle of the corpus at all; the only
    shuffle is the per-doc count over the (rare) matching shingles. Set
    ``broadcast_probes=False`` for unusually large probe sets.

    r7: both sides join on 64-bit shingle HASHES (word_shingles_hashed)
    instead of shingle strings — no array_join string build per gram on
    the corpus side, 8-byte join keys. Distinct grams ↔ distinct hashes
    up to 2⁻⁶⁴ collisions, the repo's standard hashed-dedup contract;
    shared counts are identical absent a collision.

    ``kernel=True`` (default, r7 continuation): BOTH sides build their
    shingle-hash sets via ``_shingle_set_kernel`` (per-word JVM hash +
    vectorized chained-XXH64 windows + per-doc unique in numpy) instead
    of the interpreted n-ary transform + array_distinct + explode; the
    join, broadcast and per-doc count are unchanged. Output-identical
    (both sides share one family; counts depend only on shingle
    equality) — pinned by ``test_contamination_kernel_matches_jvm``."""
    build = _shingle_set_kernel if kernel else word_shingles_hashed
    probe_sh = (
        build(probes, n, text_col, id_col)
        .select("_shh")
        .distinct()
    )
    if broadcast_probes:
        probe_sh = F.broadcast(probe_sh)
    doc_sh = build(docs, n, text_col, id_col)  # distinct per doc
    return (
        doc_sh.join(probe_sh, on="_shh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .where(F.col("shared_shingles") >= min_shared)
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Near-duplicate CLUSTERS from a pair table: transitively close the
    pairs (connected components) and label every document with its cluster's
    canonical id (the minimum doc id in the component). Documents in no pair
    are their own singleton cluster. Returns ``(doc_id, cluster_id)`` —
    ``where(cluster_id != doc_id)`` is the drop set, one retained doc per
    cluster.

    This is the step the pairwise dedup ops (minhash/simhash/jaccard) feed
    at pipeline scale: pairs alone over-delete (A~B, B~C ⇒ dropping both B
    and C needs the transitive closure to keep exactly one of {A,B,C})."""
    from .graph import connected_components

    comp = connected_components(pairs, src_col=src_col, dst_col=dst_col)
    return (
        df.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_chunks: int | None = None,
    portable: bool = False,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming. Candidate
    generation bands the 64-bit signature into ``max_hamming + 1`` blocks
    (exact recall by pigeonhole — see simhash_pairs_from_signatures), then
    verifies exactly via bit_count(xor). ``portable=True`` switches the
    word-hash family to the md5-derived one any SQL engine can reproduce
    (see simhash_signatures); ``bucket_cap`` bounds adversarial dense
    buckets (see simhash_pairs_from_signatures)."""
    sigs = simhash_signatures(df, text_col, id_col, portable=portable).cache()
    _DEDUP_CACHES.append(sigs)
    return simhash_pairs_from_signatures(
        sigs,
        max_hamming=max_hamming,
        id_col=id_col,
        n_chunks=n_chunks,
        bucket_cap=bucket_cap,
    )
