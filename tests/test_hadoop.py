"""Hadoop-compat layer tests (reference analogues: Test*Codec +
Test*CodecByteAtATime pairs driven in-process, SURVEY.md §4)."""

from __future__ import annotations

import io

import numpy as np
import pytest

from aircompressor_tpu.hadoop import CODEC_REGISTRY, get_codec

ALL_CODECS = sorted(CODEC_REGISTRY)


def _round_trip(codec_name: str, data: bytes, read_size: int = -1) -> bytes:
    streams = get_codec(codec_name)
    sink = io.BytesIO()
    out = streams.create_output_stream(sink)
    for i in range(0, len(data), 100_001):
        out.write(data[i : i + 100_001])
    out.finish()
    src = streams.create_input_stream(io.BytesIO(sink.getvalue()))
    if read_size < 0:
        return src.read()
    chunks = []
    while True:
        c = src.read(read_size)
        if not c:
            return b"".join(chunks)
        chunks.append(c)


@pytest.fixture(scope="module")
def payload():
    return (open("/root/reference/testdata/urls.10K", "rb").read() * 2)[:400_000]


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_round_trip(codec, payload):
    assert _round_trip(codec, payload) == payload


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_round_trip_small_reads(codec, payload):
    """Byte-at-a-time-style stressed reads (reference: *CodecByteAtATime)."""
    data = payload[:30_000]
    assert _round_trip(codec, data, read_size=997) == data


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_empty(codec):
    assert _round_trip(codec, b"") == b""


def test_lz4_wire_format(payload):
    """Hadoop LZ4 wire: BE uncompressed length + BE chunk length + payload
    decodable by the raw block codec (reference: Lz4HadoopInputStream)."""
    from aircompressor_tpu.lz4 import Lz4Decompressor

    data = payload[:10_000]
    streams = get_codec("org.apache.hadoop.io.compress.Lz4Codec")
    sink = io.BytesIO()
    out = streams.create_output_stream(sink)
    out.write(data)
    out.finish()
    raw = sink.getvalue()
    un_len = int.from_bytes(raw[0:4], "big")
    comp_len = int.from_bytes(raw[4:8], "big")
    assert un_len == len(data)
    assert 8 + comp_len == len(raw)
    assert Lz4Decompressor.create().decompress(raw[8:], un_len) == data


def test_gzip_interop(payload):
    """Hadoop GzipCodec output is plain gzip."""
    import gzip

    data = payload[:20_000]
    streams = get_codec("org.apache.hadoop.io.compress.GzipCodec")
    sink = io.BytesIO()
    out = streams.create_output_stream(sink)
    out.write(data)
    out.finish()
    assert gzip.decompress(sink.getvalue()) == data


def test_zstd_interop(payload):
    import oracles

    if oracles.zstd_module() is None:
        pytest.skip("zstandard unavailable")
    zstandard = oracles.zstd_module()
    data = payload[:20_000]
    streams = get_codec("org.apache.hadoop.io.compress.ZStandardCodec")
    sink = io.BytesIO()
    out = streams.create_output_stream(sink)
    out.write(data)
    out.finish()
    r = zstandard.ZstdDecompressor().stream_reader(
        io.BytesIO(sink.getvalue()), read_across_frames=True
    )
    assert r.read() == data


def test_registry_names():
    for name in (
        "org.apache.hadoop.io.compress.Lz4Codec",
        "org.apache.hadoop.io.compress.SnappyCodec",
        "org.apache.hadoop.io.compress.ZStandardCodec",
        "org.apache.hadoop.io.compress.LzoCodec",
        "com.hadoop.compression.lzo.LzoCodec",
        "com.hadoop.compression.lzo.LzopCodec",
        "org.apache.hadoop.io.compress.BZip2Codec",
        "org.apache.hadoop.io.compress.GzipCodec",
        "org.apache.hadoop.io.compress.DefaultCodec",
    ):
        assert get_codec(name) is not None
    with pytest.raises(KeyError):
        get_codec("org.example.NoSuchCodec")


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_round_trip_one_byte_reads(codec):
    """TRUE byte-at-a-time reads (reference: Test*CodecByteAtATime wraps
    every codec in a 1-byte-per-call decompressor)."""
    data = open("/root/reference/testdata/urls.10K", "rb").read()[:5_000]
    assert _round_trip(codec, data, read_size=1) == data


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_reset_state_restarts_stream(codec):
    """reset_state() lets a reader restart on a NEW stream mid-object —
    Hadoop's split-reset contract (HadoopInputStream.resetState)."""
    import io

    from aircompressor_tpu.hadoop import CODEC_REGISTRY

    streams = CODEC_REGISTRY[codec]
    a, b = b"first stream " * 300, b"second stream " * 301
    sink = io.BytesIO()
    w = streams.create_output_stream(sink)
    w.write(a)
    w.finish()
    first_len = len(sink.getvalue())
    w2 = streams.create_output_stream(sink)
    w2.write(b)
    w2.finish()
    blob = sink.getvalue()

    src = io.BytesIO(blob)
    r = streams.create_input_stream(src)
    out = bytearray()
    while len(out) < len(a):
        c = r.read(len(a) - len(out))
        if not c:
            break
        out += c
    assert bytes(out) == a
    # jump to the second stream and reset decoder state
    src.seek(first_len)
    if hasattr(r, "reset_state"):
        r.reset_state()
        out2 = bytearray()
        while True:
            c = r.read(65536)
            if not c:
                break
            out2 += c
        assert bytes(out2) == b
