"""Zstd device decode tier: bit-exactness vs libzstd output.

Runs the three-kernel Pallas pipeline (ops/zstd_jax + ops/zstd_pallas) on
whatever backend is available — interpret mode on CPU, compiled on TPU —
and checks decode of libzstd frames at several levels is bit-exact.
Mirrors the reference's oracle strategy (AbstractTestZstd.java): decode
the third-party compressor's output and compare to the original.
"""

import numpy as np
import pytest

from tests import oracles
from tests.conftest import TESTDATA, has_testdata

pytestmark = pytest.mark.skipif(not has_testdata(), reason="no testdata")


def _load(name: str) -> bytes:
    import os

    return open(os.path.join(TESTDATA, name), "rb").read()


def _items():
    items, raws = [], []
    for name in ("urls.10K", "geo.protodata"):
        data = _load(name)[:131072]
        for lo in range(0, len(data), 65536):
            chunk = data[lo : lo + 65536]
            for level in (1, 3, 19):
                items.append(oracles.zstd_compress(chunk, level))
                raws.append(chunk)
    rng = np.random.default_rng(7)
    for extra in (b"", b"a", b"ab" * 3000,
                  bytes(rng.integers(0, 256, 5000, dtype=np.uint8))):
        items.append(oracles.zstd_compress(extra, 3))
        raws.append(extra)
    return items, raws


def test_device_decode_bit_exact():
    from aircompressor_tpu.ops import zstd_jax

    items, raws = _items()
    outs = zstd_jax.decode_batch(items)
    for i, (got, want) in enumerate(zip(outs, raws)):
        assert got == want, f"item {i}: {len(got)} vs {len(want)} bytes"


def test_device_decode_rejects_corrupt():
    from aircompressor_tpu.ops import zstd_jax
    from aircompressor_tpu.errors import MalformedInputException

    from aircompressor_tpu.zstd import frame_enc

    # our own frame writer always emits a content checksum (like the
    # reference, ZstdFrameCompressor.java:123-134), so a mid-stream bit
    # flip must be caught either structurally or by the checksum
    orig = _load("urls.10K")[:4096]
    blob = bytearray(frame_enc.compress_bytes(orig))
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(MalformedInputException):
        outs = zstd_jax.decode_batch([bytes(blob)], verify_checksums=True)
        # if structure happened to survive, the checksum must not
        assert outs[0] == orig
