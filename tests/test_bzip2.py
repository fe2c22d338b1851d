"""Own bzip2 engine tests — differential vs stdlib bz2 (libbz2), mirroring
the reference's oracle strategy for TestBZip2* (we decode the oracle's
bytes; the oracle decodes ours)."""

import bz2

import numpy as np
import pytest

from aircompressor_tpu.bzip2 import (
    BZip2RefCompressor,
    BZip2RefDecompressor,
    create_compressor,
    create_decompressor,
)
from aircompressor_tpu.bzip2 import block_ref
from aircompressor_tpu.errors import MalformedInputException


def _cases(synthetic, corpus):
    for name, data in synthetic + corpus:
        yield name, data[:120_000]


def test_oracle_decodes_ours(synthetic, corpus):
    comp = BZip2RefCompressor()
    for name, data in _cases(synthetic, corpus):
        blob = comp.compress(data)
        assert bz2.decompress(blob) == data, name


def test_we_decode_oracle(synthetic, corpus):
    dec = BZip2RefDecompressor()
    for name, data in _cases(synthetic, corpus):
        for level in (1, 9):
            assert dec.decompress(bz2.compress(data, level)) == data, name


def test_own_round_trip(synthetic):
    comp, dec = BZip2RefCompressor(), BZip2RefDecompressor()
    for name, data in synthetic:
        data = data[:120_000]
        assert dec.decompress(comp.compress(data)) == data, name


def test_small_block_sizes():
    data = open("/root/reference/testdata/urls.10K", "rb").read()[:250_000]
    blob = BZip2RefCompressor(block_size_100k=1).compress(data)
    # must split into multiple blocks, each ≤ 100k
    assert bz2.decompress(blob) == data
    assert BZip2RefDecompressor().decompress(blob) == data


def test_multi_stream_concatenation():
    a = block_ref.compress(b"hello ")
    b = block_ref.compress(b"world")
    assert block_ref.decompress(a + b) == b"hello world"


def test_size_competitive(corpus):
    total_ours = total_ref = 0
    for name, data in corpus:
        data = data[:120_000]
        total_ours += len(block_ref.compress(data))
        total_ref += len(bz2.compress(data, 9))
    assert total_ours <= total_ref * 1.10, (total_ours, total_ref)


def test_malformed_rejects():
    data = b"The quick brown fox jumps over the lazy dog. " * 200
    blob = bytearray(block_ref.compress(data))
    with pytest.raises(MalformedInputException):
        block_ref.decompress(bytes(blob[:-6]) + b"\x00" * 6)  # broken EOS CRC
    bad = bytearray(blob)
    bad[20] ^= 0xFF  # inside the block payload
    with pytest.raises(MalformedInputException):
        block_ref.decompress(bytes(bad))
    with pytest.raises(MalformedInputException):
        block_ref.decompress(b"NOTBZ2!!")


def test_crc_matches_reference_poly():
    # bzip2's CRC32 is the MSB-first CRC-32 (poly 0x04C11DB7); check a
    # known vector: CRC of "123456789" is 0xFC891918 for this variant
    got = block_ref._block_crc_fast(np.frombuffer(b"123456789", np.uint8))
    assert got == 0xFC891918, hex(got)


def test_create_tiers():
    data = b"tier check " * 1000
    for comp, dec in ((create_compressor(), create_decompressor()),
                      (BZip2RefCompressor(), BZip2RefDecompressor())):
        assert dec.decompress(comp.compress(data)) == data
