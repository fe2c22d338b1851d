"""LZO block + lzop format tests (reference analogues: TestLzo.java,
TestLzopCodec golden files with each checksum-flag combination)."""

from __future__ import annotations

import glob
import io

import numpy as np
import pytest

import oracles
from codec_suite import CodecSuite
from aircompressor_tpu.errors import MalformedInputException
from aircompressor_tpu.lzo import LzoCompressor, LzoDecompressor, lzop

GOLDEN_DIR = "/root/reference/src/test/resources/data/lzo"


class TestLzoBlock(CodecSuite):
    max_len = 600_000

    def make_compressor(self):
        return LzoCompressor()

    def make_decompressor(self):
        return LzoDecompressor()

    # upstream liblzo2 (the same .so the reference loads for its
    # Hadoop-compat tests); golden lzop fixtures below add format coverage
    def has_oracle(self):
        return oracles.lzo_lib() is not None

    def oracle_compress(self, data):
        return oracles.lzo_compress(data)

    def oracle_decompress(self, comp, orig_len):
        return oracles.lzo_decompress(comp, orig_len)


@pytest.mark.parametrize(
    "path", sorted(glob.glob(f"{GOLDEN_DIR}/*.lzo")), ids=lambda p: p.split("/")[-1]
)
def test_golden_lzop_fixtures(path):
    """Reference-shipped lzop files (every checksum-flag combination) decode
    bit-exact (reference: src/test/resources/data/lzo/)."""
    expected = open(f"{GOLDEN_DIR}/test", "rb").read()
    assert lzop.decompress_file(open(path, "rb").read()) == expected


@pytest.mark.parametrize(
    "flags",
    [0, lzop.F_ADLER32_D, lzop.F_CRC32_D,
     lzop.F_ADLER32_D | lzop.F_ADLER32_C, lzop.F_CRC32_D | lzop.F_CRC32_C,
     lzop.F_H_CRC32 | lzop.F_CRC32_D],
    ids=hex,
)
def test_lzop_round_trip_flag_matrix(flags):
    data = open(f"{GOLDEN_DIR}/test", "rb").read() * 3
    blob = lzop.compress_file(data, flags)
    assert lzop.decompress_file(blob) == data


def test_lzop_multi_block():
    data = bytes(np.random.default_rng(0).integers(0, 7, 700_000, dtype=np.uint8))
    blob = lzop.compress_file(data)
    assert lzop.decompress_file(blob) == data


def test_lzop_corrupt_checksum_rejected():
    data = b"checksummed payload " * 50
    blob = bytearray(lzop.compress_file(data, lzop.F_ADLER32_D))
    blob[-3] ^= 0xFF  # flip a payload byte; adler must catch it
    with pytest.raises(MalformedInputException):
        lzop.decompress_file(bytes(blob))


def test_lzop_bad_magic_rejected():
    with pytest.raises(MalformedInputException):
        lzop.decompress_file(b"not an lzop file at all")


def test_decoder_rejects_truncation():
    data = b"truncate me " * 100
    blob = LzoCompressor().compress(data)
    for cut in (1, len(blob) // 2, len(blob) - 1):
        with pytest.raises(MalformedInputException):
            LzoDecompressor().decompress(blob[:cut], len(data))


def test_decoder_overlapping_copies():
    # dist < len overlap runs (the DEC_32/DEC_64 analogue paths)
    for pat in (b"a", b"ab", b"abc", b"abcd", b"abcde"):
        data = pat * 5000
        blob = LzoCompressor().compress(data)
        assert LzoDecompressor().decompress(blob, len(data)) == data
