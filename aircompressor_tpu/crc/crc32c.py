"""CRC32-C (Castagnoli, iSCSI polynomial) — vectorized.

Behavioral parity: reference snappy/Crc32C.java:28-60 (including the snappy
framing mask). The reference uses 8x256 slicing tables and a sequential byte
loop; that design is wrong for SIMD/TPU. Instead we exploit that CRC is linear
over GF(2):

    crc_pre(M) = A^n(init) XOR  XOR_i  A^(n-1-i)( T[b_i] )

where A(c) = T[c & 0xff] ^ (c >> 8) is the one-byte state-advance map and T is
the standard byte table (T is linear, T[x^y]=T[x]^T[y]). Every byte's
contribution is independent, so we:

  1. look up T[b_i] for all bytes at once,
  2. apply A^(n-1-i) to each via binary decomposition of the exponent —
     log2(n) rounds of "apply the fixed linear map A^(2^j) where bit j of the
     exponent is set", each map materialized as 4x256 u32 tables,
  3. XOR-reduce.

O(n log n) table gathers, fully data-parallel — the same formulation runs in
numpy (host tier) and jnp (TPU tier, see ops/checksum_jax.py).
"""

from __future__ import annotations

import numpy as np

POLY_REFLECTED = 0x82F63B78  # iSCSI CRC32-C, reflected


def _make_byte_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (POLY_REFLECTED if (c & 1) else 0)
        table[i] = c
    return table


BYTE_TABLE = _make_byte_table()


def _advance_map_basis() -> list[int]:
    """Images of the 32 basis vectors under A(c) = T[c&0xff] ^ (c>>8)."""
    return [int(BYTE_TABLE[(1 << b) & 0xFF]) ^ ((1 << b) >> 8) for b in range(32)]


def _compose(m2: list[int], m1: list[int]) -> list[int]:
    """Compose linear maps given as basis images: (m2 ∘ m1)."""
    out = []
    for b in range(32):
        v = m1[b]
        r = 0
        while v:
            low = v & -v
            r ^= m2[low.bit_length() - 1]
            v ^= low
        out.append(r)
    return out


def _map_to_tables(m: list[int]) -> np.ndarray:
    """Materialize a GF(2) linear map (basis images) as 4x256 u32 tables."""
    tabs = np.zeros((4, 256), dtype=np.uint32)
    for k in range(4):
        for byte in range(256):
            r = 0
            v = byte
            while v:
                low = v & -v
                r ^= m[8 * k + low.bit_length() - 1]
                v ^= low
            tabs[k, byte] = r
    return tabs


MAX_LOG = 32  # supports inputs up to 2^32 bytes


def _build_power_tables() -> np.ndarray:
    """tables[j] = 4x256 tables for A^(2^j), j in [0, MAX_LOG)."""
    tabs = np.zeros((MAX_LOG, 4, 256), dtype=np.uint32)
    m = _advance_map_basis()
    for j in range(MAX_LOG):
        tabs[j] = _map_to_tables(m)
        m = _compose(m, m)
    return tabs


POWER_TABLES = _build_power_tables()


def _apply_map_scalar(tabs: np.ndarray, v: int) -> int:
    return int(tabs[0, v & 0xFF] ^ tabs[1, (v >> 8) & 0xFF] ^ tabs[2, (v >> 16) & 0xFF] ^ tabs[3, (v >> 24) & 0xFF])


def crc32c_raw(data, crc: int = 0) -> int:
    """CRC32-C without the snappy mask. ``crc`` is a previous unmasked crc to
    continue from (init/final xor handled internally, like zlib.crc32)."""
    b = data if isinstance(data, np.ndarray) else np.frombuffer(memoryview(data), dtype=np.uint8)
    n = int(b.size)
    state = (crc ^ 0xFFFFFFFF) & 0xFFFFFFFF
    if n == 0:
        return (state ^ 0xFFFFFFFF) & 0xFFFFFFFF
    contrib = BYTE_TABLE[b]
    exps = np.arange(n - 1, -1, -1, dtype=np.int64)
    c = contrib
    j = 0
    while n > 1 and (1 << j) <= n - 1:
        sel = (exps >> j) & 1
        tabs = POWER_TABLES[j]
        mapped = (
            tabs[0][c & 0xFF]
            ^ tabs[1][(c >> 8) & 0xFF]
            ^ tabs[2][(c >> 16) & 0xFF]
            ^ tabs[3][(c >> 24) & 0xFF]
        )
        c = np.where(sel.astype(bool), mapped, c)
        j += 1
    acc = int(np.bitwise_xor.reduce(c))
    # advance the initial state across n bytes: A^n(state)
    s = state
    k = n
    j = 0
    while k:
        if k & 1:
            s = _apply_map_scalar(POWER_TABLES[j], s)
        k >>= 1
        j += 1
    return ((acc ^ s) ^ 0xFFFFFFFF) & 0xFFFFFFFF


def mask_crc(crc: int) -> int:
    """Snappy framing-format CRC mask (reference: snappy/Crc32C.java masked
    variant: rotate-right-15 then + 0xa282ead8)."""
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def masked_crc32c(data) -> int:
    return mask_crc(crc32c_raw(data))


class Crc32C:
    """Streaming CRC32-C with an update/digest interface."""

    def __init__(self) -> None:
        self._crc = 0

    def update(self, data) -> "Crc32C":
        self._crc = crc32c_raw(data, self._crc)
        return self

    def digest(self) -> int:
        return self._crc

    def masked_digest(self) -> int:
        return mask_crc(self._crc)
