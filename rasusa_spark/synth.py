"""Deterministic synthetic fixtures (FIXTURES.md §1–§2). No wall-clock, no
external data — every value is a pure function of (seed, row index).

``seed_tokens`` is the 16-row analog of the reference's
``tests/cases/seed.fastq`` golden fixture (16 reads × 4 bp). ``tokens_raw``
is the engine's main table: the exact ``input_hint`` schema plus a
deterministic event-time column for (source, bucket) windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("row_idx", T.LongType(), False),
    ]
)

_SOURCES = np.array(["web", "books", "code", "wiki", "forums"])
# Zipf-ish skew: ~60% web (deliberate, for salting/AQE coverage)
_SOURCE_CUM = np.array([0.60, 0.75, 0.87, 0.95, 1.0])

VOCAB = 50_257
EPOCH_2026 = np.int64(1_767_225_600)  # 2026-01-01T00:00:00Z
SPAN_SECONDS = 14 * 86_400  # 14 days of data → ≥2 daily buckets


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless splittable hash (public splitmix64 finalizer) — used only
    for fixture synthesis, not for reference-parity sampling."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D4B49AAB8EB83B)
    return z ^ (z >> np.uint64(31))


def seed_tokens_pdf() -> pd.DataFrame:
    """16-row golden-parity fixture: doc_id read1..read16, 4 tokens each,
    single source group (FIXTURES.md §1 ↔ tests/cases/seed.fastq)."""
    rows = {
        "doc_id": [f"read{i + 1}" for i in range(16)],
        "tokens": [[1, 2, 3, 4] for _ in range(16)],
        "n_tok": np.full(16, 4, dtype=np.int32),
        "source": ["seedfq"] * 16,
        "ts": pd.to_datetime([EPOCH_2026 * 10**9] * 16),
        "row_idx": np.arange(16, dtype=np.int64),
    }
    return pd.DataFrame(rows)


def seed_tokens_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(seed_tokens_pdf(), schema=TOKENS_SCHEMA)


def tokens_raw_pdf(
    n: int,
    seed: int = 42,
    start: int = 0,
    max_n_tok: int = 2047,
    with_tokens: bool = True,
) -> pd.DataFrame:
    """Rows [start, start+n) of the deterministic ``tokens_raw`` table
    (FIXTURES.md §2). Pure function of (seed, i) so any partition of the
    index range synthesizes independently (used by the distributed
    generator below)."""
    i = np.arange(start, start + n, dtype=np.uint64)
    h1 = _splitmix64(i ^ np.uint64(seed))
    h2 = _splitmix64(i + np.uint64(0xDEADBEEF) + np.uint64(seed))
    h3 = _splitmix64(i + np.uint64(0x5EED) * np.uint64(seed + 1))

    span = max_n_tok - 16 + 1
    n_tok = (16 + (h1 % np.uint64(span))).astype(np.int32)
    u = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    src_idx = np.searchsorted(_SOURCE_CUM, u, side="right").clip(0, 4)
    source = _SOURCES[src_idx]

    secs = (h3 % np.uint64(SPAN_SECONDS)).astype(np.int64)
    # gap-fill coverage: day-2 hours 03:00-05:59 left empty for 'wiki'
    day2_gap = (secs >= 86_400 + 3 * 3600) & (secs < 86_400 + 6 * 3600)
    secs = np.where((src_idx == 3) & day2_gap, secs + 3 * 3600, secs)
    ts = pd.to_datetime((EPOCH_2026 + secs) * np.int64(10**9))

    doc_id = np.char.add(
        np.char.add(source.astype("U8"), "-"),
        np.char.zfill(i.astype(np.int64).astype("U12"), 12),
    )

    out = {
        "doc_id": doc_id,
        "n_tok": n_tok,
        "source": source,
        "ts": ts,
        "row_idx": i.astype(np.int64),
    }
    if with_tokens:
        # tokens[i][j] = splitmix64(i*2^20 + j) % VOCAB — deterministic,
        # vectorized over the whole ragged batch
        total = int(n_tok.sum())
        flat_row = np.repeat(i, n_tok)
        offs = np.concatenate([[0], np.cumsum(n_tok.astype(np.int64))])
        flat_j = np.arange(total, dtype=np.uint64) - np.repeat(
            offs[:-1].astype(np.uint64), n_tok
        )
        flat = (_splitmix64((flat_row << np.uint64(20)) + flat_j) % np.uint64(VOCAB)).astype(
            np.int32
        )
        out["tokens"] = [flat[offs[k] : offs[k + 1]] for k in range(len(i))]
    else:
        out["tokens"] = [np.zeros(0, dtype=np.int32)] * len(i)
    pdf = pd.DataFrame(out)
    return pdf[["doc_id", "tokens", "n_tok", "source", "ts", "row_idx"]]


ALIGNED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("chrom", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("segment", T.StringType(), False),  # 'first' | 'last'
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("row_idx", T.LongType(), False),
    ]
)


def aligned_reads_pdf(
    n_per_chrom: int = 5000, chroms: int = 2, seed: int = 42, paired: bool = False
) -> pd.DataFrame:
    """FIXTURES.md §5: coordinate-sorted interval rows for the depth-cap
    operator — lengths 100–1000, depth varying ~2–11 (the reference's
    plasmid_2-like profile, stream.rs:460-467). ``paired`` duplicates every
    template as first+last segments with shifted mate coordinates."""
    rows = []
    idx = 0
    for c in range(chroms):
        i = np.arange(n_per_chrom, dtype=np.uint64)
        h = _splitmix64(i + np.uint64(seed + 1000 * c))
        h2 = _splitmix64(i + np.uint64(seed + 7777 + 1000 * c))
        # spacing tuned so instantaneous depth wanders between ~2 and ~11
        gaps = (h % np.uint64(120)).astype(np.int64) + 10
        starts = np.cumsum(gaps)
        lengths = (h2 % np.uint64(901)).astype(np.int64) + 100
        for j in range(n_per_chrom):
            did = f"c{c}r{j:06d}"
            rows.append(
                (did, f"chrom{c}", int(starts[j]), int(starts[j] + lengths[j]),
                 "first", int(lengths[j]), idx)
            )
            idx += 1
            if paired:
                rows.append(
                    (did, f"chrom{c}", int(starts[j] + lengths[j] + 50),
                     int(starts[j] + 2 * lengths[j] + 50), "last", int(lengths[j]), idx)
                )
                idx += 1
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "chrom", "start", "end", "segment", "n_tok", "row_idx"]
    )
    return pdf.sort_values(["chrom", "start"], kind="mergesort").reset_index(drop=True)


def aligned_reads_df(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(aligned_reads_pdf(**kw), schema=ALIGNED_SCHEMA)


def tokens_raw_df(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    max_n_tok: int = 2047,
    with_tokens: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed synthesis: partition the index range, synthesize each
    slice executor-side with ``mapInPandas`` — no driver materialization,
    scales linearly with cores (this is how the 10¹²-row design point would
    be seeded on a real cluster)."""
    parts = partitions or max(1, min(256, n // 50_000 or 1))
    bounds = np.linspace(0, n, parts + 1, dtype=np.int64)
    ranges = spark.createDataFrame(
        [(int(bounds[k]), int(bounds[k + 1])) for k in range(parts)],
        "start long, stop long",
    ).repartition(parts)

    def gen(batches):
        for pdf in batches:
            for _, r in pdf.iterrows():
                if r.stop > r.start:
                    yield tokens_raw_pdf(
                        int(r.stop - r.start),
                        seed=seed,
                        start=int(r.start),
                        max_n_tok=max_n_tok,
                        with_tokens=with_tokens,
                    )

    return ranges.mapInPandas(gen, schema=TOKENS_SCHEMA)
