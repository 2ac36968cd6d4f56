"""Minimal pure-Python BAM interval reader — fixture anchoring only.

Parses just enough of the public SAM/BAM v1 specification
(https://samtools.github.io/hts-specs/SAMv1.pdf §4) to turn a
coordinate-sorted BAM into an interval table (qname, chrom, start, end,
flag) for the depth-cap operators: BGZF is a series of concatenated gzip
members (Python's zlib/gzip handles multi-member streams natively), and
each alignment record is a fixed header + CIGAR, from which the reference
span is pos .. pos + Σ(ref-consuming op lengths).

This is NOT a production reader — at scale alignments arrive as
parquet/Iceberg tables (SURVEY §2.1/S2); this module exists so the
depth-cap tests can anchor on the reference checkout's real BAM fixture
(tests/cases/no_start_end.bam) instead of synthetic intervals only
(VERDICT r1 "What's missing" #1 partial unblock).
"""

from __future__ import annotations

import gzip
import struct

#: CIGAR ops that consume reference bases: M, D, N, =, X
_REF_CONSUMING = {0, 2, 3, 7, 8}

FLAG_UNMAPPED = 0x4
FLAG_SECONDARY = 0x100
FLAG_SUPPLEMENTARY = 0x800


def read_bam_reads(path: str) -> list[tuple[int, str, int, int, bool]]:
    """Decode ``path`` into [(row_idx, qname, seq_len, flag, mapped)] in
    file order — the reads-subcommand view (record identity + length), which
    is all the reference's two-pass `reads` modes consume from a uBAM
    (source.rs read_lengths). Works on mapped and unmapped BAMs alike."""
    out: list[tuple[int, str, int, int, bool]] = []
    for i, (qname, ref_id, _pos, flag, _ref_len, l_seq) in enumerate(
        _iter_records(path)
    ):
        mapped = ref_id >= 0 and not flag & FLAG_UNMAPPED
        out.append((i, qname, l_seq, flag, mapped))
    return out


def read_bam_intervals(path: str) -> list[tuple[str, str, int, int, int]]:
    """Decode ``path`` into [(qname, chrom, start, end, flag)] using 0-based
    half-open coordinates. Unmapped records (no position) are skipped;
    records whose CIGAR is absent get end = start + 1 (minimal span), the
    same degenerate handling htslib applies to '*' CIGARs."""
    ref_names, records = _parse(path)
    out: list[tuple[str, str, int, int, int]] = []
    for qname, ref_id, pos, flag, ref_len, _l_seq in records:
        if ref_id >= 0 and not flag & FLAG_UNMAPPED:
            out.append((qname, ref_names[ref_id], pos, pos + max(ref_len, 1), flag))
    return out


def _iter_records(path: str):
    return _parse(path)[1]


def _parse(path: str):
    with open(path, "rb") as fh:
        data = gzip.decompress(fh.read())
    if data[:4] != b"BAM\x01":
        raise ValueError(f"{path}: not a BAM stream (bad magic)")
    off = 4
    (l_text,) = struct.unpack_from("<i", data, off)
    off += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    ref_names: list[str] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4
        ref_names.append(data[off : off + l_name - 1].decode())
        off += l_name + 4  # name (NUL-terminated) + l_ref
    records: list[tuple[str, int, int, int, int, int]] = []
    n = len(data)
    while off + 4 <= n:
        (block_size,) = struct.unpack_from("<i", data, off)
        off += 4
        rec_end = off + block_size
        (
            ref_id,
            pos,
            l_read_name,
            _mapq,
            _bin,
            n_cigar_op,
            flag,
            l_seq,
        ) = struct.unpack_from("<iiBBHHHi", data, off)
        name_off = off + 32
        qname = data[name_off : name_off + l_read_name - 1].decode()
        cig_off = name_off + l_read_name
        ref_len = 0
        for i in range(n_cigar_op):
            (op,) = struct.unpack_from("<I", data, cig_off + 4 * i)
            if op & 0xF in _REF_CONSUMING:
                ref_len += op >> 4
        records.append((qname, ref_id, pos, flag, ref_len, l_seq))
        off = rec_end
    return ref_names, records
