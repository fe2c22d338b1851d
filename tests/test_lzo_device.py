"""LZO device decode tier tests (ops/lzo_pallas_w + ops/batch.LzoBatchCodec).

Off-TPU the megakernel runs in Pallas interpret mode (Python-speed), so the
kernel test uses small chunks; the batch codec off-TPU uses the host tier.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from aircompressor_tpu.lzo import LzoCompressor  # noqa: E402
from aircompressor_tpu.ops import lzo_pallas_w  # noqa: E402
from aircompressor_tpu.ops.batch import LzoBatchCodec  # noqa: E402


def _cases() -> list[bytes]:
    rng = np.random.default_rng(11)
    return [
        b"",
        b"x",
        b"hello world hello world hello",
        bytes(2000),  # RLE -> near overlapping copies
        b"ab" * 1500,
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),  # incompressible
        bytes(rng.integers(0, 4, 4000, dtype=np.uint8)),  # match-heavy
        (b"0123456789abcdef" * 32
         + bytes(rng.integers(0, 256, 32, dtype=np.uint8))) * 6,
        open("/root/reference/testdata/html", "rb").read()[:8000],
    ]


def test_kernel_bit_exact_vs_ref():
    comp = LzoCompressor.create()
    raws = _cases()
    blobs = [bytes(comp.compress(r)) for r in raws]
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    for mod in (lzo_pallas_w,):
        out, olens, ok = mod.decode(jnp.asarray(buf), jnp.asarray(lens))
        out, olens, ok = np.asarray(out), np.asarray(olens), np.asarray(ok)
        for i, r in enumerate(raws):
            assert bool(ok[i]), (mod.__name__, i)
            assert out[i, : olens[i]].tobytes() == r, (mod.__name__, i)


def test_kernel_rejects_malformed():
    comp = LzoCompressor.create()
    good = bytes(comp.compress(b"some data to compress " * 20))
    bad_blobs = [
        b"\x00",  # extension runs past the input
        b"\x11\x00",  # truncated stop command
        good[:8],  # truncated stream
        b"\x40\xff" + b"\x00" * 8,  # M2 offset before output start
    ]
    buf = np.zeros((len(bad_blobs), 1024), np.uint8)
    lens = np.zeros(len(bad_blobs), np.int32)
    for i, b in enumerate(bad_blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    for mod in (lzo_pallas_w,):
        _, _, ok = mod.decode(jnp.asarray(buf), jnp.asarray(lens))
        assert not np.asarray(ok).any(), mod.__name__


def test_batch_codec_round_trip():
    codec = LzoBatchCodec()
    chunks = [c for c in _cases() if c]
    blobs = codec.compress_chunks(chunks)
    assert codec.decompress_chunks(blobs) == chunks
