"""Deflate / gzip / bzip2 / XXH3 tests (reference analogues: TestDeflate.java,
TestJdkGzipCodec.java, TestBZip2*.java, TestXxHash3.java)."""

from __future__ import annotations

import bz2
import gzip as py_gzip
import io
import zlib

import numpy as np
import pytest

import oracles
from codec_suite import CodecSuite
from aircompressor_tpu.bzip2 import BZip2InputStream, BZip2OutputStream
from aircompressor_tpu.bzip2 import compress_stream as bz_compress
from aircompressor_tpu.bzip2 import decompress_stream as bz_decompress
from aircompressor_tpu.deflate import (
    DeflateCompressor,
    DeflateDecompressor,
    DeflateNativeCompressor,
    DeflateRefCompressor,
    DeflateRefDecompressor,
)
from aircompressor_tpu.gzip import compress_stream as gz_compress
from aircompressor_tpu.gzip import decompress_stream as gz_decompress
from aircompressor_tpu.xxhash import xxh3_64, xxh3_128, xxh3_is_enabled


class TestDeflateRef(CodecSuite):
    max_len = 600_000

    def make_compressor(self):
        return DeflateRefCompressor()

    def make_decompressor(self):
        return DeflateRefDecompressor()

    def has_oracle(self):
        return True

    def oracle_compress(self, data):
        co = zlib.compressobj(4, zlib.DEFLATED, -zlib.MAX_WBITS)
        return co.compress(data) + co.flush()

    def oracle_decompress(self, comp, orig_len):
        return zlib.decompress(comp, -zlib.MAX_WBITS, max(orig_len, 1))


class TestDeflateNative(CodecSuite):
    max_len = 600_000
    # libdeflate at the same numeric level beats zlib slightly; either way
    # both must stay close
    oracle_size_slack = 1.05

    def _available(self):
        try:
            DeflateNativeCompressor()
            return True
        except RuntimeError:
            return False

    def make_compressor(self):
        if not self._available():
            pytest.skip("libdeflate unavailable")
        return DeflateNativeCompressor()

    def make_decompressor(self):
        if not self._available():
            pytest.skip("libdeflate unavailable")
        from aircompressor_tpu.deflate import DeflateNativeDecompressor

        return DeflateNativeDecompressor()

    def has_oracle(self):
        return True

    def oracle_compress(self, data):
        co = zlib.compressobj(6, zlib.DEFLATED, -zlib.MAX_WBITS)
        return co.compress(data) + co.flush()

    def oracle_decompress(self, comp, orig_len):
        return zlib.decompress(comp, -zlib.MAX_WBITS, max(orig_len, 1))


def test_deflate_create():
    c = DeflateCompressor.create()
    d = DeflateDecompressor.create()
    data = b"deflate me please " * 500
    assert d.decompress(c.compress(data), len(data)) == data


def test_gzip_round_trip(corpus):
    for name, data in corpus:
        blob = gz_compress(data)
        assert py_gzip.decompress(blob) == data, name  # oracle reads ours
        assert gz_decompress(py_gzip.compress(data)) == data, name  # we read oracle


def test_gzip_concatenated_streams():
    a, b = b"first stream!", b"second stream " * 100
    blob = py_gzip.compress(a) + py_gzip.compress(b)
    assert gz_decompress(blob) == a + b


def test_bzip2_round_trip(corpus):
    for name, data in corpus:
        blob = bz_compress(data)
        assert bz2.decompress(blob) == data, name
        assert bz_decompress(bz2.compress(data)) == data, name


def test_bzip2_concatenated_streams():
    a, b = b"alpha" * 50, b"beta" * 77
    assert bz_decompress(bz2.compress(a) + bz2.compress(b)) == a + b


def test_bzip2_finish_without_close():
    sink = io.BytesIO()
    s = BZip2OutputStream(sink)
    s.write(b"payload " * 100)
    s.finish()
    sink.write(b"TRAILER")  # sink still usable after finish
    raw = sink.getvalue()
    assert raw.endswith(b"TRAILER")
    assert bz2.decompress(raw[:-7]) == b"payload " * 100


def test_bzip2_incremental_read():
    data = bytes(np.random.default_rng(0).integers(0, 5, 100_000, dtype=np.uint8))
    src = BZip2InputStream(io.BytesIO(bz2.compress(data)))
    chunks = []
    while True:
        c = src.read(777)
        if not c:
            break
        chunks.append(c)
    assert b"".join(chunks) == data


@pytest.mark.skipif(not xxh3_is_enabled(), reason="libxxhash unavailable")
def test_xxh3_vs_reference_lib():
    """Cross-check the system libxxhash against the pinned .so the reference
    ships (two independent builds of the same algorithm)."""
    lib = oracles.xxhash_lib()
    if lib is None:
        pytest.skip("reference libxxhash unavailable")
    import ctypes

    lib.XXH3_64bits.restype = ctypes.c_uint64
    for n in (0, 1, 17, 100, 1000, 65536):
        data = bytes(np.random.default_rng(n).integers(0, 256, n, dtype=np.uint8))
        assert xxh3_64(data) == int(lib.XXH3_64bits(data, n)), n


@pytest.mark.skipif(not xxh3_is_enabled(), reason="libxxhash unavailable")
def test_xxh3_streaming_matches_oneshot():
    from aircompressor_tpu.xxhash import XxHash3Hasher, XxHash3Hasher128

    data = bytes(np.random.default_rng(1).integers(0, 256, 100_000, dtype=np.uint8))
    with XxHash3Hasher() as h:
        for i in range(0, len(data), 7777):
            h.update(data[i : i + 7777])
        assert h.digest() == xxh3_64(data)
    with XxHash3Hasher128() as h:
        for i in range(0, len(data), 990):
            h.update(data[i : i + 990])
        assert h.digest() == xxh3_128(data)
