"""LZ4 block + frame tests (reference analogues: TestLz4.java,
TestLz4FrameDecompressor.java)."""

import numpy as np
import pytest

import oracles
from aircompressor_tpu.errors import MalformedInputException
from aircompressor_tpu.lz4 import (
    Lz4RefCompressor,
    Lz4RefDecompressor,
    constants,
    frame,
)
from aircompressor_tpu.lz4.frame_codec import Lz4FrameCompressor, Lz4FrameDecompressor
from codec_suite import CodecSuite


class TestLz4Block(CodecSuite):
    max_len = 600_000

    def make_compressor(self):
        return Lz4RefCompressor()

    def make_decompressor(self):
        return Lz4RefDecompressor()

    def has_oracle(self):
        return oracles.lz4_lib() is not None

    def oracle_compress(self, data):
        return oracles.lz4_compress(data)

    def oracle_decompress(self, comp, orig_len):
        return oracles.lz4_decompress(comp, orig_len)

    def malformed_cases(self):
        return [
            b"",  # empty input (reference: Lz4RawDecompressor.java:48-50)
            bytes([0x00, 0x01]),  # token 0 then trailing garbage offset
            # literal length runs past end of input
            bytes([0xF0, 255, 255]),
            # match offset pointing before start of output
            bytes([0x11, ord("a"), 0xFF, 0xFF]),
        ]


class TestLz4Frame(CodecSuite):
    max_len = 600_000

    def make_compressor(self):
        return Lz4FrameCompressor(Lz4RefCompressor())

    def make_decompressor(self):
        return Lz4FrameDecompressor(Lz4RefDecompressor())

    # liblz4's LZ4F_* frame API (callable via the xxhash shim in oracles.py)
    def has_oracle(self):
        return oracles.lz4f_lib() is not None

    def oracle_compress(self, data):
        return oracles.lz4f_compress(data)

    def oracle_decompress(self, comp, orig_len):
        return oracles.lz4f_decompress(comp, orig_len)

    def malformed_cases(self):
        good = bytes(self.make_compressor().compress(b"hello hello hello hello"))
        bad_magic = b"\x00\x00\x00\x00" + good[4:]
        bad_hc = good[:6] + bytes([good[6] ^ 0xFF]) + good[7:]
        truncated = good[: len(good) - 5]
        return [bad_magic, bad_hc, truncated, b"\x04\x22\x4d\x18"]


def _frame_header(flg: int, bd: int, extra: bytes = b"") -> bytes:
    from aircompressor_tpu.xxhash import xxh32

    body = bytes([flg, bd]) + extra
    hc = (xxh32(body) >> 8) & 0xFF
    return (0x184D2204).to_bytes(4, "little") + body + bytes([hc])


class TestLz4FrameFeatures:
    """Hand-crafted frames covering decoder features the compressor never
    emits (reference: TestLz4FrameDecompressor.java:39-90)."""

    def _decode(self, data: bytes, cap: int = 1 << 16) -> bytes:
        return Lz4FrameDecompressor(Lz4RefDecompressor()).decompress(data, cap)

    def test_uncompressed_block(self):
        payload = b"stored-raw"
        f = (
            _frame_header(0x60, 0x70)
            + (len(payload) | 0x80000000).to_bytes(4, "little")
            + payload
            + (0).to_bytes(4, "little")
        )
        assert self._decode(f) == payload

    def test_linked_blocks_rejected(self):
        f = _frame_header(0x40, 0x70) + (0).to_bytes(4, "little")
        with pytest.raises(MalformedInputException, match="linked"):
            self._decode(f)

    def test_dictionary_rejected(self):
        f = _frame_header(0x61, 0x70, b"\x01\x02\x03\x04") + (0).to_bytes(4, "little")
        with pytest.raises(MalformedInputException, match="dictionar"):
            self._decode(f)

    def test_reserved_flg_bit_rejected(self):
        f = _frame_header(0x62, 0x70) + (0).to_bytes(4, "little")
        with pytest.raises(MalformedInputException, match="reserved"):
            self._decode(f)

    def test_reserved_bd_bits_rejected(self):
        f = _frame_header(0x60, 0x71) + (0).to_bytes(4, "little")
        with pytest.raises(MalformedInputException, match="reserved"):
            self._decode(f)

    def test_content_size_mismatch(self):
        f = _frame_header(0x68, 0x70, (99).to_bytes(8, "little")) + (0).to_bytes(4, "little")
        with pytest.raises(MalformedInputException, match="content size"):
            self._decode(f)

    def test_bad_block_checksum(self):
        payload = b"abcd"
        f = (
            _frame_header(0x70, 0x70)
            + (len(payload) | 0x80000000).to_bytes(4, "little")
            + payload
            + (0xDEADBEEF).to_bytes(4, "little")
            + (0).to_bytes(4, "little")
        )
        with pytest.raises(MalformedInputException, match="block checksum"):
            self._decode(f)

    def test_bad_content_checksum(self):
        f = (
            _frame_header(0x64, 0x70)
            + (0).to_bytes(4, "little")
            + (0xDEADBEEF).to_bytes(4, "little")
        )
        with pytest.raises(MalformedInputException, match="content checksum"):
            self._decode(f)

    def test_skippable_frame_alone_rejected(self):
        sk = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"xyz"
        with pytest.raises(MalformedInputException, match="no LZ4 frame"):
            self._decode(sk)

    def test_acceleration_bounds(self):
        with pytest.raises(ValueError):
            Lz4RefCompressor(0)
        with pytest.raises(ValueError):
            Lz4RefCompressor(65538)
        Lz4RefCompressor(65537)

    def test_max_compressed_length_formula(self):
        # n + n/255 + 16 (reference: Lz4RawCompressor.java:64-67)
        assert constants.max_compressed_length(0) == 16
        assert constants.max_compressed_length(255) == 272
        assert constants.max_compressed_length(65536) == 65536 + 257 + 16


@pytest.mark.skipif(oracles.lz4_lib() is None, reason="liblz4 oracle unavailable")
def test_acceleration_tradeoff():
    data = open("/root/reference/testdata/html", "rb").read()[:100000]
    sizes = []
    for acc in (1, 8, 64):
        sizes.append(len(Lz4RefCompressor(acc).compress(data)))
        out = Lz4RefDecompressor().decompress(
            Lz4RefCompressor(acc).compress(data), len(data)
        )
        assert out == data
    assert sizes[0] <= sizes[1] <= sizes[2]


@pytest.mark.skipif(
    __import__("aircompressor_tpu.native", fromlist=["x"]).is_enabled() is False,
    reason="native tier not built",
)
class TestLz4BlockNative(TestLz4Block):
    max_len = 1 << 22  # native tier is fast — use full files

    def make_compressor(self):
        from aircompressor_tpu.lz4 import Lz4NativeCompressor

        return Lz4NativeCompressor()

    def make_decompressor(self):
        from aircompressor_tpu.lz4 import Lz4NativeDecompressor

        return Lz4NativeDecompressor()


# ------------------------------------------------------------ frame streams
class TestLz4FrameStreams:
    """File-like LZ4 frame streams (lz4/streams.py) interop with the
    one-shot frame codec and validation paths."""

    def _data(self):
        return open("/root/reference/testdata/urls.10K", "rb").read()

    def test_stream_writer_one_shot_reader(self):
        from aircompressor_tpu.lz4.frame_codec import Lz4FrameDecompressor
        from aircompressor_tpu.lz4.streams import compress_stream

        data = self._data()
        blob = compress_stream(data, block_max_id=4, block_checksums=True)
        assert Lz4FrameDecompressor().decompress(blob, len(data)) == data

    def test_one_shot_writer_stream_reader(self):
        from aircompressor_tpu.lz4.frame_codec import Lz4FrameCompressor
        from aircompressor_tpu.lz4.streams import decompress_stream

        data = self._data()
        blob = Lz4FrameCompressor.create(
            content_checksum=True, content_size=True
        ).compress(data)
        assert decompress_stream(blob) == data

    def test_partial_reads_and_concatenated_frames(self):
        import io

        from aircompressor_tpu.lz4.streams import (
            Lz4FrameInputStream,
            compress_stream,
        )

        a, b = b"first frame " * 500, b"second frame " * 700
        blob = compress_stream(a) + compress_stream(b)
        s = Lz4FrameInputStream(io.BytesIO(blob))
        out = bytearray()
        while True:
            c = s.read(997)
            if not c:
                break
            out += c
        assert bytes(out) == a + b

    def test_block_checksum_corruption_rejected(self):
        from aircompressor_tpu.lz4.streams import compress_stream, decompress_stream

        data = self._data()
        blob = bytearray(compress_stream(data, block_checksums=True))
        blob[20] ^= 0xFF
        with pytest.raises(MalformedInputException):
            decompress_stream(bytes(blob))
