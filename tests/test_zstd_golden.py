"""Reference golden zstd fixtures (reference: zstd/AbstractTestZstd.java:41-200,
fixtures in src/test/resources/data/zstd/).

These binary fixtures are the reference's adversarial regression corpus:
checksummed frames, concatenated frames, an offset-before-start stream that
must be rejected, a bad second frame, a 3-byte-header RLE block, incompressible
data, and the huffman-table-reuse trap case.
"""

import os

import numpy as np
import pytest

from aircompressor_tpu.errors import MalformedInputException
from aircompressor_tpu.zstd import ZstdRefCompressor, ZstdRefDecompressor
from aircompressor_tpu.zstd import frame_dec

FIXTURES = "/root/reference/src/test/resources/data/zstd"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference golden fixtures unavailable"
)


def _load(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def _decode(comp: bytes, cap: int) -> bytes:
    dst = np.empty(cap, np.uint8)
    n = frame_dec.decompress(np.frombuffer(comp, np.uint8), dst)
    return dst[:n].tobytes()


def test_decompress_with_checksum():
    # reference: AbstractTestZstd.testDecompressWithOutputPaddingAndChecksum
    comp = _load("with-checksum.zst")
    plain = _load("with-checksum")
    assert _decode(comp, len(plain) + 64) == plain


def test_decompress_with_output_padding_and_checksum():
    # decode into a padded buffer; padding before/after must stay intact
    padding = 1021
    comp = _load("with-checksum.zst")
    plain = _load("with-checksum")
    out = np.full(len(plain) + 2 * padding, 0xA5, np.uint8)
    n = frame_dec.decompress(
        np.frombuffer(comp, np.uint8), out[padding : len(out) - padding]
    )
    assert n == len(plain)
    assert out[padding : padding + n].tobytes() == plain
    assert (out[:padding] == 0xA5).all() and (out[padding + n :] == 0xA5).all()


def test_concatenated_frames():
    # reference: AbstractTestZstd.testConcatenatedFrames
    comp = _load("multiple-frames.zst")
    plain = _load("multiple-frames")
    assert _decode(comp, len(plain)) == plain


def test_invalid_sequence_offset_rejected():
    # reference: AbstractTestZstd.testInvalidSequenceOffset
    comp = _load("offset-before-start.zst")
    with pytest.raises(MalformedInputException):
        _decode(comp, len(comp) * 10)


def test_bad_second_frame_rejected():
    # reference: AbstractTestZstd.testVerifyMagicInAllFrames
    comp = _load("bad-second-frame.zst")
    plain = _load("multiple-frames")
    with pytest.raises(MalformedInputException):
        _decode(comp, len(plain))


def test_missing_data_rejected():
    # reference: AbstractTestZstd.testDecompressIsMissingData
    comp = bytes([40, 256 - 75, 47, 256 - 3, 32, 0, 1, 0])
    with pytest.raises(MalformedInputException):
        _decode(comp, 1024)


@pytest.mark.parametrize(
    "name",
    ["large-rle", "incompressible", "small-literals-after-incompressible-literals"],
)
def test_own_compressor_round_trips_fixture(name):
    # reference: testLargeRle / testIncompressibleData /
    # testSmallLiteralsAfterIncompressibleLiterals — these fixtures trap
    # compressor bugs (3-byte RLE headers, maxCompressedLength overflow,
    # speculative huffman-table reuse across raw-literal blocks)
    plain = _load(name)
    comp = ZstdRefCompressor()
    out = np.empty(comp.max_compressed_length(len(plain)), np.uint8)
    n = comp.compress_into(np.frombuffer(plain, np.uint8), out)
    dec = ZstdRefDecompressor()
    back = np.empty(len(plain), np.uint8)
    m = dec.decompress_into(out[:n], back)
    assert back[:m].tobytes() == plain


def test_max_compressed_size_formula():
    # reference: AbstractTestZstd.testMaxCompressedSize
    c = ZstdRefCompressor()
    assert c.max_compressed_length(0) == 64
    assert c.max_compressed_length(64 * 1024) == 65_824
    assert c.max_compressed_length(128 * 1024) == 131_584
    assert c.max_compressed_length(128 * 1024 + 1) == 131_585
