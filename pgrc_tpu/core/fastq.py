"""Host-side reads IO: FASTQ/FASTA/line formats, pairing, quality division.

Replaces readsset/iterator/ReadsSetIterator.cpp + DivisionReadsSetDecorators.cpp
with vectorized numpy parsing over whole-file buffers (constant-length reads).

Format autodetection mirrors ReadsSetPersistence.cpp:36-47 (first byte:
'@' FASTQ, '>' FASTA, otherwise one read per line).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils import dna


@dataclass
class ReadsSet:
    """All reads of one input (or pair-interleaved input) as matrices."""

    codes: np.ndarray          # [N, L] uint8 value codes (0..4)
    quality: np.ndarray | None  # [N, L] uint8 phred+33 bytes, or None
    read_len: int

    @property
    def count(self) -> int:
        return self.codes.shape[0]


def detect_format(path: str) -> str:
    with open(path, "rb") as f:
        first = f.read(1)
    if first == b"@":
        return "fastq"
    if first == b">":
        return "fasta"
    return "lines"


def _split_lines_matrix(buf: bytes):
    """Return (data, line_starts, line_lengths) for a whole-file buffer."""
    data = np.frombuffer(buf, dtype=np.uint8)
    if data.size == 0:
        empty = np.zeros(0, dtype=np.int64)
        return data, empty, empty
    if data[-1] != ord("\n"):
        data = np.concatenate([data, np.array([ord("\n")], dtype=np.uint8)])
    ends = np.nonzero(data == ord("\n"))[0]
    starts = np.concatenate([[0], ends[:-1] + 1])
    lengths = ends - starts
    return data, starts, lengths


def read_fastq(path: str) -> ReadsSet:
    """Parse a FASTQ file of constant-length reads into code/quality matrices."""
    with open(path, "rb") as f:
        buf = f.read()
    from .. import native

    fast = native.fastq_parse(buf)
    if fast is not None:
        codes, quality = fast
        return ReadsSet(codes=codes, quality=quality, read_len=codes.shape[1])
    data, starts, lengths = _split_lines_matrix(buf)
    nlines = starts.size
    if nlines % 4:
        raise ValueError(f"{path}: FASTQ line count {nlines} not divisible by 4")
    n = nlines // 4
    seq_starts = starts[1::4]
    seq_lens = lengths[1::4]
    read_len = int(seq_lens[0])
    if not (seq_lens == read_len).all():
        raise ValueError(f"{path}: variable-length reads unsupported (constant-length model)")
    qual_starts = starts[3::4]
    idx = seq_starts[:, None] + np.arange(read_len)[None, :]
    codes = dna.SYM2VAL[data[idx]]
    quality = data[qual_starts[:, None] + np.arange(read_len)[None, :]]
    return ReadsSet(codes=codes, quality=quality, read_len=read_len)


def read_fasta(path: str) -> ReadsSet:
    with open(path, "rb") as f:
        buf = f.read()
    data, starts, lengths = _split_lines_matrix(buf)
    is_seq = data[starts] != ord(">")
    seq_starts = starts[is_seq]
    seq_lens = lengths[is_seq]
    read_len = int(seq_lens[0])
    if not (seq_lens == read_len).all():
        raise ValueError(f"{path}: variable-length reads unsupported")
    idx = seq_starts[:, None] + np.arange(read_len)[None, :]
    return ReadsSet(codes=dna.SYM2VAL[data[idx]], quality=None, read_len=read_len)


def read_lines(path: str) -> ReadsSet:
    with open(path, "rb") as f:
        buf = f.read()
    data, starts, lengths = _split_lines_matrix(buf)
    keep = lengths > 0
    seq_starts = starts[keep]
    seq_lens = lengths[keep]
    read_len = int(seq_lens[0])
    if not (seq_lens == read_len).all():
        raise ValueError(f"{path}: variable-length reads unsupported")
    idx = seq_starts[:, None] + np.arange(read_len)[None, :]
    return ReadsSet(codes=dna.SYM2VAL[data[idx]], quality=None, read_len=read_len)


def read_any(path: str) -> ReadsSet:
    fmt = detect_format(path)
    if fmt == "fastq":
        return read_fastq(path)
    if fmt == "fasta":
        return read_fasta(path)
    return read_lines(path)


def read_paired(path1: str, path2: str, revcomp_pair: bool) -> ReadsSet:
    """Interleave two paired files read1,read2,read1,... (reference
    ReadsSetPersistence::createManagedReadsIterator pairing); optionally
    reverse-complement every second read (RevComplPairReadsSetIterator,
    ReadsSetIterator.cpp:249-287)."""
    r1 = read_any(path1)
    r2 = read_any(path2)
    if r1.read_len != r2.read_len or r1.count != r2.count:
        raise ValueError("paired files must have equal read counts and lengths")
    n, L = r1.codes.shape
    codes = np.empty((2 * n, L), dtype=np.uint8)
    codes[0::2] = r1.codes
    codes[1::2] = dna.revcomp_codes(r2.codes, axis=1) if revcomp_pair else r2.codes
    quality = None
    if r1.quality is not None and r2.quality is not None:
        quality = np.empty((2 * n, L), dtype=np.uint8)
        quality[0::2] = r1.quality
        quality[1::2] = r2.quality[:, ::-1] if revcomp_pair else r2.quality
    return ReadsSet(codes=codes, quality=quality, read_len=L)


def quality_high_mask(
    reads: ReadsSet, error_limit: float, simplified_suffix_mode: bool = True
) -> np.ndarray:
    """Vectorized quality classifier (DivisionReadsSetDecorators.cpp:30-38).

    simplified mode: quality[readLength*(1-error_limit)] > '#'
    full mode: arithmetic mean of per-base correct probability >= 1-error_limit.
    """
    if reads.quality is None:
        return np.ones(reads.count, dtype=bool)
    if simplified_suffix_mode:
        suffix_pos = int(reads.read_len * (1.0 - error_limit))
        suffix_pos = min(suffix_pos, reads.read_len - 1)
        return reads.quality[:, suffix_pos] > ord("#")
    probs = dna.QUALITY2PROB[reads.quality]
    return (1.0 - probs.mean(axis=1)) <= error_limit


def contains_n_mask(reads: ReadsSet) -> np.ndarray:
    return (reads.codes == dna.N).any(axis=1)


def write_reads_lines(path: str, codes: np.ndarray) -> None:
    """Write a [N, L] code matrix as ASCII read lines (decoder output format;
    the reference also emits bare read lines, pgrc-decoder.cpp:160-165)."""
    with open(path, "wb") as f:
        f.write(reads_lines_bytes(codes))


def reads_lines_bytes(codes: np.ndarray) -> bytes:
    from .. import native

    fast = native.reads_write_lines(codes)
    if fast is not None:
        return fast
    n, L = codes.shape
    out = np.empty((n, L + 1), dtype=np.uint8)
    out[:, :L] = dna.VAL2SYM[codes]
    out[:, L] = ord("\n")
    return out.tobytes()
