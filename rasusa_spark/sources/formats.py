"""Output format & compression inference from paths (S8).

Engine analog of the reference's single-source-of-truth format module
(reference src/format.rs:26-93: extension→format with the trailing
compression extension stripped first; src/cli.rs:421-431 one-letter
compression codes; src/cli.rs:443-470 compression-level range parsing).
The reference maps fastx/alignment extensions to niffler codecs; the engine
maps Spark sink formats to Spark writer codecs — same contract: the PATH
alone fully determines how output is encoded unless the caller overrides.

All helpers are pure (driver-side string logic); ``write_inferred`` applies
them to a DataFrameWriter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: extension → Spark sink format (format.rs:46-60 analog)
FORMAT_EXTS = {
    "parquet": "parquet",
    "orc": "orc",
    "json": "json",
    "jsonl": "json",
    "ndjson": "json",
    "csv": "csv",
    "tsv": "csv",
    "txt": "text",
    "text": "text",
    "avro": "avro",
}

#: trailing compression extension → Spark codec name (format.rs:48-52's
#: strip list, mapped onto Spark/Hadoop codec names)
COMPRESSION_EXTS = {
    "gz": "gzip",
    "bgz": "gzip",
    "bz2": "bzip2",
    "bz": "bzip2",
    "zst": "zstd",
    "xz": "lzma",
    "lz4": "lz4",
    "snappy": "snappy",
    "br": "brotli",
    "deflate": "deflate",
}

#: codecs each Spark sink accepts (so inference fails loudly instead of at
#: executor write time with a cryptic Hadoop error)
_SINK_CODECS = {
    "parquet": {"none", "uncompressed", "snappy", "gzip", "zstd", "lz4", "brotli", "lzo"},
    "orc": {"none", "uncompressed", "snappy", "zlib", "zstd", "lz4"},
    "json": {"none", "uncompressed", "gzip", "bzip2", "deflate", "lz4", "snappy", "zstd", "lzma"},
    "csv": {"none", "uncompressed", "gzip", "bzip2", "deflate", "lz4", "snappy", "zstd", "lzma"},
    "text": {"none", "uncompressed", "gzip", "bzip2", "deflate", "lz4", "snappy", "zstd", "lzma"},
    "avro": {"uncompressed", "snappy", "deflate", "bzip2", "xz", "zstandard"},
}

#: one-letter compression codes (cli.rs:421-431: b/g/l/x/z/u)
_COMPRESSION_CODES = {
    "b": "bzip2",
    "g": "gzip",
    "l": "lzma",
    "x": "lzma",  # the reference maps both Lzma and Xz onto the xz container
    "z": "zstd",
    "u": "none",
}


def _split_exts(path: str) -> list[str]:
    name = os.path.basename(path.rstrip("/"))
    parts = name.lower().split(".")
    return parts[1:] if len(parts) > 1 else []


def infer_compression(path: str) -> str | None:
    """Codec from the TRAILING extension (``data.csv.gz`` → gzip), or None."""
    exts = _split_exts(path)
    if exts and exts[-1] in COMPRESSION_EXTS:
        return COMPRESSION_EXTS[exts[-1]]
    return None


def infer_format(path: str) -> str | None:
    """Sink format from the extension, with any trailing compression
    extension stripped first (format.rs:48-57's two-step strip)."""
    exts = _split_exts(path)
    if exts and exts[-1] in COMPRESSION_EXTS:
        exts = exts[:-1]
    if exts and exts[-1] in FORMAT_EXTS:
        return FORMAT_EXTS[exts[-1]]
    return None


def parse_compression_format(code: str) -> str:
    """One-letter compression selector (cli.rs:421-431): b/g/l/x/z/u,
    case-insensitive; anything else is an error, never a silent default."""
    try:
        return _COMPRESSION_CODES[code.lower()]
    except KeyError:
        raise ValueError(
            f"invalid compression code {code!r}; use one of "
            f"{sorted(_COMPRESSION_CODES)}"
        ) from None


def parse_level(s: str | int) -> int:
    """Compression level in 1..21 (cli.rs:443-470); out-of-range or
    non-numeric input raises with the reference's message shape."""
    try:
        lvl = int(s)
    except (TypeError, ValueError):
        raise ValueError(f"Compression level {s} not in the range 1-21") from None
    if not 1 <= lvl <= 21:
        raise ValueError(f"Compression level {s} not in the range 1-21")
    return lvl


def writer_options(
    path: str,
    output_format: str | None = None,
    compression: str | None = None,
    level: int | None = None,
) -> tuple[str, dict[str, str]]:
    """Resolve (format, writer options) for ``path``. Explicit arguments win
    over extension inference (is_fasta_output's precedence, format.rs:63-70);
    with neither, parquet+snappy is the table-store default. Validates the
    codec against what the sink supports. ``level`` surfaces as the
    codec-level option keys Spark honours (zstd/gzip on parquet)."""
    fmt = output_format or infer_format(path) or "parquet"
    if fmt not in _SINK_CODECS:
        raise ValueError(f"unsupported sink format {fmt!r}")
    codec = compression or infer_compression(path)
    if codec is None:
        codec = "snappy" if fmt in ("parquet", "orc") else "none"
    if codec not in _SINK_CODECS[fmt]:
        raise ValueError(
            f"codec {codec!r} is not supported by the {fmt} sink; "
            f"choose from {sorted(_SINK_CODECS[fmt])}"
        )
    opts = {"compression": codec}
    if level is not None:
        lvl = parse_level(level)
        if fmt == "parquet" and codec == "zstd":
            opts["parquet.compression.codec.zstd.level"] = str(lvl)
        # other sinks take levels from cluster/hadoop conf, not writer options
    return fmt, opts


def write_inferred(
    df: DataFrame,
    path: str,
    output_format: str | None = None,
    compression: str | None = None,
    level: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` to ``path`` with format/codec inferred from the path
    (S8 end-to-end): ``out.jsonl.gz`` → gzip-compressed JSON lines, etc."""
    fmt, opts = writer_options(path, output_format, compression, level)
    df.write.mode(mode).options(**opts).format(fmt).save(path)
