"""Deflate device decode tier tests (native inflate planner +
ops/deflate_pallas_w + ops/batch.DeflateBatchCodec).

Off-TPU the megakernel runs in Pallas interpret mode (Python-speed), so
kernel tests use small chunks; the batch codec off-TPU uses the host tier.
Reference contract stood in for: deflate/DeflateNative.java:28-40.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from aircompressor_tpu import native  # noqa: E402
from aircompressor_tpu.deflate import device_prep  # noqa: E402
from aircompressor_tpu.ops.batch import DeflateBatchCodec  # noqa: E402

needs_native = pytest.mark.skipif(
    not native.is_enabled(), reason="native planner unavailable")


def _cases() -> list[bytes]:
    rng = np.random.default_rng(11)
    return [
        b"",
        b"x",
        b"hello world hello world hello",
        bytes(2000),  # RLE -> overlapping copies
        b"ab" * 1500,
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),  # incompressible
        bytes(rng.integers(0, 4, 4000, dtype=np.uint8)),  # match-heavy
        (b"0123456789abcdef" * 32
         + bytes(rng.integers(0, 256, 32, dtype=np.uint8))) * 6,
        open("/root/reference/testdata/html", "rb").read()[:8000],
    ]


def _deflate(raw: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(raw) + co.flush()


def _pack(blobs):
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return buf, lens


@needs_native
def test_planner_matches_zlib_all_levels():
    """Planner + the kernel-semantics simulator are bit-exact vs zlib
    across stored/fixed/dynamic blocks (levels 0/1/6/9)."""
    raws, blobs = [], []
    for lvl in (0, 1, 6, 9):
        for c in _cases():
            raws.append(c)
            blobs.append(_deflate(c, lvl))
    buf, lens = _pack(blobs)
    desc, tabs, info = device_prep.plan_batch(buf, lens)
    assert (info[:, 3] == device_prep.ST_OK).all()
    for i, r in enumerate(raws):
        assert info[i, 0] == len(r)
        assert device_prep.simulate_chunk(blobs[i], desc[i], tabs[i]) == r


@needs_native
def test_planner_flags_malformed():
    bad = [
        b"\x07",                    # reserved btype
        b"\x05\x00",                # truncated fixed block
        _deflate(np.random.default_rng(0).integers(
            0, 256, 4000, dtype=np.uint8).tobytes(), 6)[:20],  # truncated
        bytes([0x02, 0x00]),        # truncated dynamic header
        b"\x01\x03\x00\x00\x00",    # stored LEN != ~NLEN
    ]
    buf, lens = _pack(bad)
    _, _, info = device_prep.plan_batch(buf, lens)
    assert (info[:, 3] == device_prep.ST_MALFORMED).all()


@needs_native
def test_planner_many_blocks_falls_back():
    """>16 blocks exceeds the kernel descriptor row -> ST_FALLBACK."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    parts = []
    for i in range(20):
        parts.append(co.compress(b"block %d " % i * 20))
        parts.append(co.flush(zlib.Z_FULL_FLUSH))
    parts.append(co.flush())
    blob = b"".join(parts)
    buf, lens = _pack([blob])
    _, _, info = device_prep.plan_batch(buf, lens)
    assert info[0, 3] == device_prep.ST_FALLBACK


@needs_native
def test_kernel_bit_exact_vs_zlib():
    from aircompressor_tpu.ops import deflate_pallas_w

    raws, blobs = [], []
    for lvl in (0, 1, 9):
        for c in _cases():
            raws.append(c)
            blobs.append(_deflate(c, lvl))
    buf, lens = _pack(blobs)
    desc, tabs, info = device_prep.plan_batch(buf, lens)
    assert (info[:, 3] == device_prep.ST_OK).all()
    pages, _ = device_prep.pack_pages(desc, tabs, info)
    out, olens, ok = deflate_pallas_w.decode(
        jnp.asarray(buf), jnp.asarray(lens), pages)
    out, olens, ok = np.asarray(out), np.asarray(olens), np.asarray(ok)
    for i, r in enumerate(raws):
        assert bool(ok[i]), i
        assert out[i, : olens[i]].tobytes() == r, i


@needs_native
def test_kernel_rejects_corrupt_bitstream():
    """A valid PLAN over a corrupted bitstream must fail closed (the
    kernel re-derives everything from the bits; flipping payload bytes
    after planning must not produce ok=True with wrong content)."""
    from aircompressor_tpu.ops import deflate_pallas_w

    raw = open("/root/reference/testdata/html", "rb").read()[:6000]
    blob = _deflate(raw, 9)
    buf, lens = _pack([blob, blob, blob, blob])
    desc, tabs, info = device_prep.plan_batch(buf, lens)
    assert (info[:, 3] == device_prep.ST_OK).all()
    pages, _ = device_prep.pack_pages(desc, tabs, info)
    rng = np.random.default_rng(5)
    for row in range(1, 4):
        pos = int(rng.integers(len(blob) // 2, len(blob) - 8))
        buf[row, pos] ^= 0xFF
    out, olens, ok = deflate_pallas_w.decode(
        jnp.asarray(buf), jnp.asarray(lens), pages)
    out, olens, ok = np.asarray(out), np.asarray(olens), np.asarray(ok)
    assert bool(ok[0]) and out[0, : olens[0]].tobytes() == raw
    for row in range(1, 4):
        # fail-closed contract: either the kernel flags it, or the batch
        # codec's out_len-vs-plan check catches it
        wrong = (not bool(ok[row])) or olens[row] != len(raw) or (
            out[row, : olens[row]].tobytes() != raw)
        assert wrong, row


@needs_native
def test_batch_codec_round_trip():
    codec = DeflateBatchCodec()
    chunks = [c for c in _cases() if c]
    blobs = codec.compress_chunks(chunks)
    assert codec.decompress_chunks(blobs) == chunks


@needs_native
def test_batch_codec_malformed_raises():
    from aircompressor_tpu.errors import MalformedInputException

    codec = DeflateBatchCodec()
    good = codec.compress_chunks([b"payload " * 50])[0]
    with pytest.raises(MalformedInputException):
        codec.decompress_chunks([good, b"\x07"])
