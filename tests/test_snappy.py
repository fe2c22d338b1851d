"""Snappy block + framed tests (reference analogues: TestSnappy.java,
TestSnappyStream.java)."""

import io

import numpy as np
import pytest

import oracles
from aircompressor_tpu.errors import MalformedInputException
from aircompressor_tpu.snappy import (
    SnappyRefCompressor,
    SnappyRefDecompressor,
    constants,
)
from aircompressor_tpu.snappy.framed import (
    HEADER,
    SnappyFramedInputStream,
    SnappyFramedOutputStream,
    compress_framed,
    decompress_framed,
)
from codec_suite import CodecSuite


class TestSnappyBlock(CodecSuite):
    max_len = 600_000

    def make_compressor(self):
        return SnappyRefCompressor()

    def make_decompressor(self):
        return SnappyRefDecompressor()

    def has_oracle(self):
        return oracles.snappy_lib() is not None

    def oracle_compress(self, data):
        return oracles.snappy_compress(data)

    def oracle_decompress(self, comp, orig_len):
        return oracles.snappy_decompress(comp, orig_len)

    def malformed_cases(self):
        return [
            b"",  # no varint
            bytes([0xFF] * 6),  # varint too long
            bytes([0x05, 0xFC]),  # literal length runs past end
            # declared length 4, copy with offset before start
            bytes([0x04, 0x00 | (0 << 2) | 0x01, 0xFF, 0xFF]),
            # decoded size != declared
            bytes([0x10, (3 - 1) << 2, ord("a"), ord("b"), ord("c")]),
        ]


class TestSnappyFramed:
    def test_round_trip_sizes(self):
        data = (b"snappy framed stream " * 5000)[:100001]
        out = compress_framed(data)
        assert out.startswith(HEADER)
        assert decompress_framed(out) == data

    def test_incompressible_stored_uncompressed(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 70000, dtype=np.uint8).tobytes()
        out = compress_framed(data)
        # first chunk after the header must be UNCOMPRESSED (0x01)
        assert out[len(HEADER)] == 0x01
        assert decompress_framed(out) == data

    def test_checksum_verified(self):
        data = b"checksum me " * 100
        out = bytearray(compress_framed(data))
        out[-1] ^= 0xFF  # corrupt last payload byte
        with pytest.raises(MalformedInputException):
            decompress_framed(bytes(out))

    def test_bad_header(self):
        with pytest.raises(MalformedInputException):
            decompress_framed(b"not a snappy stream")

    def test_skippable_chunks(self):
        data = b"payload " * 64
        out = compress_framed(data)
        pad = bytes([0xFE, 3, 0, 0]) + b"xyz"
        patched = out[: len(HEADER)] + pad + out[len(HEADER) :]
        assert decompress_framed(patched) == data

    def test_second_stream_identifier_ok(self):
        a, b = b"first " * 100, b"second " * 100
        out = compress_framed(a) + compress_framed(b)
        assert decompress_framed(out) == a + b

    def test_unskippable_reserved_chunk(self):
        out = compress_framed(b"x")
        patched = out[: len(HEADER)] + bytes([0x02, 1, 0, 0, 0]) + out[len(HEADER) :]
        with pytest.raises(MalformedInputException):
            decompress_framed(patched)

    def test_byte_at_a_time_read(self):
        data = b"tiny reads " * 500
        stream = SnappyFramedInputStream(io.BytesIO(compress_framed(data)))
        out = bytearray()
        while True:
            b = stream.read(1)
            if not b:
                break
            out += b
        assert bytes(out) == data

    def test_block_size_bounds(self):
        with pytest.raises(ValueError):
            SnappyFramedOutputStream(io.BytesIO(), block_size=0)
        with pytest.raises(ValueError):
            SnappyFramedOutputStream(io.BytesIO(), block_size=65537)

    def test_max_compressed_length_formula(self):
        # 32 + n + n/6 (reference: SnappyRawCompressor.java:47-70)
        assert constants.max_compressed_length(0) == 32
        assert constants.max_compressed_length(60000) == 32 + 60000 + 10000


@pytest.mark.skipif(
    __import__("aircompressor_tpu.native", fromlist=["x"]).is_enabled() is False,
    reason="native tier not built",
)
class TestSnappyBlockNative(TestSnappyBlock):
    max_len = 1 << 22

    def make_compressor(self):
        from aircompressor_tpu.snappy import SnappyNativeCompressor

        return SnappyNativeCompressor()

    def make_decompressor(self):
        from aircompressor_tpu.snappy import SnappyNativeDecompressor

        return SnappyNativeDecompressor()


def test_framed_wire_bytes_masked_crc():
    """Exact wire bytes for a known chunk, including the masked CRC32C
    value 0x9274cda8 (reference: TestSnappyStream.java:50-79 asserts this
    constant for the same payload)."""
    import struct

    from aircompressor_tpu.crc.crc32c import masked_crc32c
    from aircompressor_tpu.snappy.framed import compress_framed

    payload = b"aaaaaaaaaaaabbbbbbbaaaaaa"
    blob = bytes(compress_framed(payload))
    assert blob[:10] == b"\xff\x06\x00\x00sNaPpY"
    assert masked_crc32c(payload) == 0x9274CDA8
    # the chunk after the header carries the masked CRC of the UNCOMPRESSED
    # data in its first 4 payload bytes
    flag = blob[10]
    assert flag in (0x00, 0x01)
    crc = struct.unpack("<I", blob[14:18])[0]
    assert crc == 0x9274CDA8
