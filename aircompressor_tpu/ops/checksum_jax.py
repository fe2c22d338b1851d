"""Batched CRC32-C — JAX/TPU tier.

Same GF(2)-linear formulation as the host tier (crc/crc32c.py): every byte's
contribution T[b_i] is advanced by A^(n-1-i) via log2(L) rounds of masked
4×256-table lookups, then XOR-reduced. All rounds are batched over (B, L);
gathers are jnp.take into 256-entry u32 tables (VMEM-resident).

Parity: reference snappy/Crc32C.java:28-60 (plus the framing mask).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..crc import crc32c as _host

U32 = jnp.uint32

_BYTE_TABLE = jnp.asarray(_host.BYTE_TABLE)
_POWER_TABLES = jnp.asarray(_host.POWER_TABLES)  # (32, 4, 256) u32


def _apply_map(tabs, c):
    """Apply a 4×256-table linear map to u32 array c."""
    return (
        jnp.take(tabs[0], c & 0xFF)
        ^ jnp.take(tabs[1], (c >> 8) & 0xFF)
        ^ jnp.take(tabs[2], (c >> 16) & 0xFF)
        ^ jnp.take(tabs[3], (c >> 24) & 0xFF)
    )


def crc32c(data, lengths):
    """Batched CRC32-C (unmasked, zlib-style init/final xor) → (B,) uint32.

    data: (B, L) uint8 zero-padded; lengths: (B,) int32.
    """
    B, L = data.shape
    lengths = lengths.astype(jnp.int32)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]  # (1, L)
    exps = lengths[:, None] - 1 - pos  # (B, L); negative → past end
    valid = exps >= 0
    c = jnp.where(valid, jnp.take(_BYTE_TABLE, data.astype(jnp.int32)), U32(0))
    exps = jnp.maximum(exps, 0)
    n_rounds = max(1, (L - 1)).bit_length()
    for j in range(n_rounds):
        sel = ((exps >> j) & 1).astype(bool)
        mapped = _apply_map(_POWER_TABLES[j], c)
        c = jnp.where(sel, mapped, c)
    acc = jnp.bitwise_xor.reduce(c, axis=1)
    # advance the init state 0xFFFFFFFF across `lengths` bytes
    s = jnp.full((B,), 0xFFFFFFFF, dtype=U32)
    n_len_rounds = int(L).bit_length()
    for j in range(n_len_rounds):
        sel = ((lengths >> j) & 1).astype(bool)
        s = jnp.where(sel, _apply_map(_POWER_TABLES[j], s), s)
    return (acc ^ s) ^ U32(0xFFFFFFFF)


def mask_crc(crc):
    """Snappy framing mask: rotr15 + 0xa282ead8."""
    crc = crc.astype(U32)
    return ((crc >> 15) | (crc << 17)) + U32(0xA282EAD8)


__all__ = ["crc32c", "mask_crc"]
_ = np  # keep numpy import for table dtype provenance
