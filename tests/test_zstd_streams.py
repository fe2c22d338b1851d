"""Zstd streaming tests (reference analogues: TestZstdInputStream/
OutputStream via ZstdStreamCompressor/Decompressor, TestZstdPartial —
minimum-feed byte-at-a-time drives, SURVEY.md §4)."""

from __future__ import annotations

import io

import numpy as np
import pytest

import oracles
from aircompressor_tpu.errors import MalformedInputException
from aircompressor_tpu.zstd.frame_enc import compress_bytes
from aircompressor_tpu.zstd.streams import (
    ZstdIncrementalFrameDecompressor,
    ZstdInputStream,
    ZstdOutputStream,
    compress_stream,
    decompress_stream,
)

zstandard = oracles.zstd_module()
pytestmark = pytest.mark.skipif(zstandard is None, reason="zstandard unavailable")


def _data(n=300_000):
    return (open("/root/reference/testdata/urls.10K", "rb").read() * 2)[:n]


def test_byte_at_a_time_decode():
    """Minimum-feed drive of the incremental state machine
    (reference: ZstdPartialDecompressor byte-at-a-time stress)."""
    data = _data(120_000)
    comp = zstandard.compress(data, 5)
    dec = ZstdIncrementalFrameDecompressor()
    out = bytearray()
    for i in range(len(comp)):
        out += dec.partial_decompress(comp[i : i + 1])
    assert dec.finished()
    assert bytes(out) == data


def test_multi_frame_and_skippable():
    blob = (
        zstandard.compress(b"frame one|", 3)
        + bytes.fromhex("502a4d18") + (4).to_bytes(4, "little") + b"SKIP"
        + zstandard.compress(b"frame two", 3)
    )
    dec = ZstdIncrementalFrameDecompressor()
    assert dec.partial_decompress(blob) == b"frame one|frame two"
    assert dec.finished()


def test_output_stream_single_frame_chunked_writes():
    """True streaming: ONE frame per stream regardless of write chunking
    (reference ZstdOutputStream.java:154-221), oracle-decodable."""
    data = _data()
    sink = io.BytesIO()
    zs = ZstdOutputStream(sink, 3)
    for i in range(0, len(data), 33_333):
        zs.write(data[i : i + 33_333])
    zs.finish()
    blob = sink.getvalue()
    assert blob.count(b"\x28\xb5\x2f\xfd") == 1  # one frame header
    r = zstandard.ZstdDecompressor().stream_reader(
        io.BytesIO(blob), read_across_frames=True
    )
    assert r.read() == data
    assert decompress_stream(blob) == data


def test_output_stream_window_carries_across_writes():
    """The match window survives write() boundaries: incompressible data
    written twice compresses the second copy as one cross-write match."""
    import numpy as np

    rep = bytes(np.random.default_rng(7).integers(0, 256, 100_000,
                                                  dtype=np.uint8))
    sink = io.BytesIO()
    zs = ZstdOutputStream(sink)
    zs.write(rep)
    zs.write(rep)
    zs.finish()
    blob = sink.getvalue()
    assert zstandard.ZstdDecompressor().decompress(
        blob, max_output_size=len(rep) * 2) == rep + rep
    assert len(blob) < 110_000  # second copy collapsed to matches


def test_output_stream_longer_than_window():
    """Streams larger than the window stay a single decodable frame."""
    data = (_data() * 6)[: 3 << 20]
    sink = io.BytesIO()
    zs = ZstdOutputStream(sink)
    for i in range(0, len(data), 77_777):
        zs.write(data[i : i + 77_777])
    zs.finish()
    blob = sink.getvalue()
    assert zstandard.ZstdDecompressor().decompress(
        blob, max_output_size=len(data)) == data
    assert decompress_stream(blob) == data


def test_windowed_frame_sliding_window():
    """A large windowed (non-single-segment) frame decodes with the bounded
    sliding window (window flush + compaction paths)."""
    big = _data() * 10
    co = zstandard.ZstdCompressor(level=7).compressobj()
    blob = co.compress(big) + co.flush()
    st = ZstdInputStream(io.BytesIO(blob), read_chunk=7_777)
    out = bytearray()
    while True:
        c = st.read(12_345)
        if not c:
            break
        out += c
    assert bytes(out) == big


def test_empty_stream():
    assert decompress_stream(compress_stream(b"")) == b""


def test_truncated_stream_rejected():
    comp = zstandard.compress(_data(50_000), 3)
    with pytest.raises(MalformedInputException):
        decompress_stream(comp[: len(comp) // 2])


def test_corrupt_checksum_rejected():
    data = b"checksum me " * 1000
    blob = bytearray(compress_stream(data))
    blob[-2] ^= 0x55  # inside the frame checksum
    with pytest.raises(MalformedInputException):
        decompress_stream(bytes(blob))


def test_all_frame_checksums_verified():
    data = _data(40_000)
    blob = compress_stream(data, level=3)
    # sanity: our frames carry checksums (frame header checksum flag)
    assert decompress_stream(blob) == data


def test_partial_decompress_into_minimum_feeds():
    """Drive the caller-buffer contract the way the reference's
    ZstdPartialDecompressor test helper does (AbstractTestZstd pattern):
    feed exactly input_required bytes per step and give a small output
    window, honoring input_consumed / output_buffer_used /
    requested_output_size."""
    data = open("/root/reference/testdata/urls.10K", "rb").read()[:80_000]
    blob = compress_bytes(data)
    dec = ZstdIncrementalFrameDecompressor()
    out = bytearray(len(data))
    out_pos = 0
    in_pos = 0
    while in_pos < len(blob) or not dec.is_at_stopping_point():
        feed = blob[in_pos : in_pos + max(dec.input_required, 1)]
        window = min(out_pos + 777, len(out))  # deliberately small slices
        dec.partial_decompress_into(feed, out, out_pos, window)
        out_pos += dec.output_buffer_used
        if dec.input_consumed == 0 and dec.output_buffer_used == 0:
            # output-blocked with a full window: widen
            assert dec.requested_output_size > 0
            window = len(out)
            dec.partial_decompress_into(b"", out, out_pos, window)
            out_pos += dec.output_buffer_used
            continue
        in_pos += dec.input_consumed
    assert in_pos == len(blob)
    assert bytes(out[:out_pos]) == data
    assert dec.is_at_stopping_point()


def test_partial_decompress_into_output_blocked():
    data = b"zstd incremental contract " * 3000
    blob = compress_bytes(data)
    dec = ZstdIncrementalFrameDecompressor()
    out = bytearray(len(data))
    # feed EVERYTHING but give almost no output space: input must be
    # refused (input_consumed == 0) while the backlog drains
    dec.partial_decompress_into(blob, out, 0, 100)
    assert dec.output_buffer_used == 100
    got = 100
    fed_again = 0
    while got < len(data):
        dec.partial_decompress_into(b"extra-ignored", out, got,
                                    min(got + 4096, len(out)))
        if dec.input_consumed:
            fed_again += 1  # only allowed once backlog fully drained
        got += dec.output_buffer_used
    assert bytes(out) == data
