"""Corrupt / truncated archive handling: every malformed input must raise
PgtcFormatError — never an AssertionError (stripped under -O) or an
incidental ValueError/struct error from some inner layer.

Reference posture: header validation + hard exit,
/root/reference/pgrc/pgrc-decoder.cpp:14-49.
"""
import os

import numpy as np
import pytest

from pgrc_tpu import PgtcFormatError
from pgrc_tpu.archive import decoder, encoder
from pgrc_tpu.config import PgRCParams
from tests.test_roundtrip import synth_fastq


@pytest.fixture(scope="module")
def archive_bytes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corrupt")
    src = str(tmp / "in.fastq")
    synth_fastq(src, 400, 80, 4000, seed=11)
    out = str(tmp / "a.pgtc")
    encoder.encode(PgRCParams(src_fastq=src, output=out))
    with open(out, "rb") as f:
        return f.read()


def _expect_format_error(tmp_path, data: bytes, name: str):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(data)
    with pytest.raises(PgtcFormatError):
        decoder.load(p)


def test_not_an_archive(tmp_path):
    _expect_format_error(tmp_path, b"garbage data not pgtc", "bad.pgtc")


def test_empty_file(tmp_path):
    _expect_format_error(tmp_path, b"", "empty.pgtc")


def test_magic_only(tmp_path):
    _expect_format_error(tmp_path, b"PGTC", "magic.pgtc")


def test_bad_version(tmp_path, archive_bytes):
    data = bytearray(archive_bytes)
    data[4] = 9
    _expect_format_error(tmp_path, bytes(data), "ver.pgtc")


@pytest.mark.parametrize("frac", [0.3, 0.6, 0.9, 0.99])
def test_truncated(tmp_path, archive_bytes, frac):
    cut = archive_bytes[: int(len(archive_bytes) * frac)]
    _expect_format_error(tmp_path, cut, f"trunc_{frac}.pgtc")


@pytest.mark.parametrize("seed", range(8))
def test_flipped_bytes(tmp_path, archive_bytes, seed):
    """Random single-byte corruption in the stream area must raise
    PgtcFormatError or decode to provably-wrong-but-contained output —
    never AssertionError or an uncontrolled internal exception."""
    rng = np.random.default_rng(seed)
    data = bytearray(archive_bytes)
    # corrupt past the fixed header so the payload/record area is hit
    pos = int(rng.integers(16, len(data)))
    data[pos] ^= int(rng.integers(1, 256))
    p = str(tmp_path / f"flip_{seed}.pgtc")
    with open(p, "wb") as f:
        f.write(bytes(data))
    try:
        ar = decoder.load(p)
        # if parsing succeeded despite the flip, output assembly must not
        # blow up with an internal error either
        decoder._decode_all_reads(ar)
    except PgtcFormatError:
        pass
    except AssertionError as e:  # pragma: no cover - the failure we forbid
        pytest.fail(f"corrupt archive raised AssertionError: {e}")


def test_zeroed_stream_area(tmp_path, archive_bytes):
    data = bytearray(archive_bytes)
    data[len(data) // 2 :] = bytes(len(data) - len(data) // 2)
    _expect_format_error(tmp_path, bytes(data), "zeroed.pgtc")
