"""JAX/TPU ops tier — differential tests vs the host (scalar/numpy) tier.

Runs on the CPU backend (see conftest.py: virtual 8-device mesh). Mirrors the
reference's hash test strategy (reference: xxhash/AbstractTestXxHash64.java
XSUM-style vectors) but checks the batched-kernel path against the already
XSUM-validated scalar tier across a grid of lengths including every tail
class (0..35, stripe boundaries, large).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from aircompressor_tpu.crc import crc32c as host_crc
from aircompressor_tpu.ops import checksum_jax, xxhash_jax
from aircompressor_tpu.xxhash import _scalar


def _grid(L):
    lens = list(range(0, 36)) + [47, 48, 63, 64, 65, 100, L]
    return np.array([min(L, v) for v in lens], dtype=np.int32)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(42)
    L = 256
    lengths = _grid(L)
    data = rng.integers(0, 256, size=(lengths.size, L), dtype=np.uint8)
    for i, n in enumerate(lengths):
        data[i, n:] = 0
    return data, lengths


@pytest.mark.parametrize("seed", [0, 0x9E3779B185EBCA87 & 0xFFFFFFFFFFFFFFFF])
def test_xxh64_batched(batch, seed):
    data, lengths = batch
    hi, lo = xxhash_jax.xxh64(jnp.asarray(data), jnp.asarray(lengths), seed=seed)
    hi, lo = np.asarray(hi), np.asarray(lo)
    for i, n in enumerate(lengths):
        expected = _scalar.xxh64(data[i, :n].tobytes(), seed=seed)
        assert (int(hi[i]) << 32) | int(lo[i]) == expected, (i, n)


@pytest.mark.parametrize("seed", [0, 0x9E3779B1])
def test_xxh32_batched(batch, seed):
    data, lengths = batch
    h = np.asarray(xxhash_jax.xxh32(jnp.asarray(data), jnp.asarray(lengths), seed=seed))
    for i, n in enumerate(lengths):
        assert int(h[i]) == _scalar.xxh32(data[i, :n].tobytes(), seed=seed), (i, n)


def test_crc32c_batched(batch):
    data, lengths = batch
    got = np.asarray(checksum_jax.crc32c(jnp.asarray(data), jnp.asarray(lengths)))
    masked = np.asarray(
        checksum_jax.mask_crc(checksum_jax.crc32c(jnp.asarray(data), jnp.asarray(lengths)))
    )
    for i, n in enumerate(lengths):
        raw = data[i, :n].tobytes()
        assert int(got[i]) == host_crc.crc32c_raw(raw), (i, n)
        assert int(masked[i]) == host_crc.masked_crc32c(raw), (i, n)


def test_snappy_pallas_megakernel():
    """Single-launch snappy decode megakernel is bit-exact vs the ref tier
    and rejects malformed input (interpret mode off-TPU).

    Reference parity: snappy/SnappyRawDecompressor.java:30-220 (the whole
    batch decodes in ONE pallas_call vs the reference's one JNI call)."""
    from aircompressor_tpu.ops import snappy_pallas8 as snappy_pallas
    from aircompressor_tpu.snappy import SnappyRefCompressor

    rng = np.random.default_rng(3)
    cases = [
        b"hello world hello world hello world",
        b"a" * 300,
        b"ab" * 500,
        bytes(rng.integers(0, 256, 1000, dtype=np.uint8)),
        (b"The quick brown fox jumps over the lazy dog. " * 40),
        b"X",
        b"abcabcabc" + bytes(rng.integers(0, 4, 900, dtype=np.uint8)),
        b"",
    ]
    comp = SnappyRefCompressor()
    blobs = [comp.compress(c) for c in cases]
    cap = 1024 * ((max(len(b) for b in blobs) + 1023) // 1024)
    B = len(blobs)
    buf = np.zeros((B, cap), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)

    out, out_lens, ok = snappy_pallas.decode(buf, lens)
    out, out_lens, ok = np.asarray(out), np.asarray(out_lens), np.asarray(ok)
    for i, c in enumerate(cases):
        assert ok[i], i
        assert out[i, : out_lens[i]].tobytes() == c, i

    # truncated input must fail, not crash or emit garbage silently
    t_lens = np.maximum(1, lens // 2)
    _, _, ok_t = snappy_pallas.decode(buf, t_lens)
    assert not np.asarray(ok_t)[0]


def test_xxh64_pallas_kernel():
    """The Pallas stripe kernel (single-launch batched xxh64) is bit-exact
    vs the XSUM-validated scalar tier (interpret mode off-TPU)."""
    import jax

    from aircompressor_tpu.ops import xxhash_pallas

    rng = np.random.default_rng(7)
    B, L = 128, 512
    data = rng.integers(0, 256, (B, L), dtype=np.uint8)
    lens_list = (list(range(0, 48)) + [63, 64, 65, 100, 255, 256, 257, L]) * 4
    lengths = np.array([min(L, v) for v in lens_list[:B]], dtype=np.int32)
    for i, n in enumerate(lengths):
        data[i, n:] = 0
    hi, lo = xxhash_pallas.xxh64(jnp.asarray(data), jnp.asarray(lengths))
    hi, lo = np.asarray(hi), np.asarray(lo)
    for i, n in enumerate(lengths):
        expected = _scalar.xxh64(data[i, :n].tobytes())
        assert (int(hi[i]) << 32) | int(lo[i]) == expected, (i, n)
