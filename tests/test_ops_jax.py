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
