"""Batched xxHash32/64 — JAX/TPU tier.

Behavioral parity with the reference's hashers (reference:
xxhash/XxHash64JavaHasher.java:29-120, xxhash/XxHash32JavaHasher.java) and the
zstd-private XxHash64 (reference: zstd/XxHash64.java) used for frame
checksums.

TPU-first design: one hash state is inherently sequential across its 32-byte
(xxh64) / 16-byte (xxh32) stripes, so parallelism comes from the BATCH axis —
B independent chunks hashed in lockstep. Layout rules that make this fast on
the VPU:

- bytes are bitcast to u32 words ONCE (no byte gathers in the hot loop);
- the word array is transposed so the batch axis is the minor (lane) dim;
- the stripe loop is a ``lax.scan`` over the major axis with UNROLL stripes
  per step (amortizes loop overhead), accumulators shaped (4, B);
- 64-bit math is explicit (hi, lo) u32 pairs (ops/u64.py).

Variable lengths are per-stream masks; the ≤31-byte tails are fixed-trip
masked gathers (tiny, once per hash).

Inputs are ``(data, lengths)``: data (B, L) uint8 zero-padded, lengths (B,)
int32. L must be a multiple of 32*UNROLL (xxh64) / 16*UNROLL (xxh32) — pad
with zeros; padding never affects the result (masked).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import u64

U32 = jnp.uint32
UNROLL = 8

# xxh64 primes
P64_1 = 0x9E3779B185EBCA87
P64_2 = 0xC2B2AE3D27D4EB4F
P64_3 = 0x165667B19E3779F9
P64_4 = 0x85EBCA77C2B2AE63
P64_5 = 0x27D4EB2F165667C5

# xxh32 primes
P32_1 = jnp.uint32(0x9E3779B1)
P32_2 = jnp.uint32(0x85EBCA77)
P32_3 = jnp.uint32(0xC2B2AE3D)
P32_4 = jnp.uint32(0x27D4EB2F)
P32_5 = jnp.uint32(0x165667B1)


def _round64(acc, lane):
    acc = u64.add(acc, u64.mul(lane, u64.const(P64_2)))
    acc = u64.rotl(acc, 31)
    return u64.mul(acc, u64.const(P64_1))


def _merge_round64(h, v):
    h = u64.xor(h, _round64(u64.const(0), v))
    return u64.add(u64.mul(h, u64.const(P64_1)), u64.const(P64_4))


def _gather_bytes(data, idx):
    """data (B, L) u8, idx (B, K) int32 → (B, K) u8 (per-row gather)."""
    return jnp.take_along_axis(data, idx, axis=1, mode="clip")


def _words_T(data):
    """(B, L) u8 → (L/4, B) u32 little-endian words (one bitcast + transpose)."""
    B, L = data.shape
    words = jax.lax.bitcast_convert_type(data.reshape(B, L // 4, 4), U32)
    return words.T


def xxh64(data, lengths, seed: int = 0):
    """Batched one-shot XXH64. Returns (B,) pair (hi, lo) uint32.

    data: (B, L) uint8 (L % (32*UNROLL) == 0, zero padded); lengths: (B,).
    """
    B, L = data.shape
    assert L % (32 * UNROLL) == 0, L
    n_stripes = L // 32
    lengths = lengths.astype(jnp.int32)
    stripes_of = lengths // 32  # full stripes per stream

    seed64 = u64.const(seed)
    v_init = (
        u64.add(seed64, u64.const((P64_1 + P64_2) & 0xFFFFFFFFFFFFFFFF)),
        u64.add(seed64, u64.const(P64_2)),
        seed64,
        u64.sub(seed64, u64.const(P64_1)),
    )
    # (4, B) accumulators; derive from inputs so the scan carry inherits
    # sharding/varying status under shard_map (the +0 fuses away)
    zero = (lengths * 0).astype(U32)[None, :]
    vhi = jnp.stack([v[0] for v in v_init])[:, None] + zero  # (4, B)
    vlo = jnp.stack([v[1] for v in v_init])[:, None] + zero

    wT = _words_T(data)  # (L/4, B)
    lanes = wT.reshape(n_stripes // UNROLL, UNROLL, 8, B)
    bases = jnp.arange(0, n_stripes, UNROLL, dtype=jnp.int32)

    def step(carry, xs):
        hi, lo = carry
        base, lane_words = xs
        for u in range(UNROLL):
            lw = lane_words[u]  # (8, B): even rows = lo, odd = hi
            lane = (lw[1::2], lw[0::2])  # (4, B) each
            nhi, nlo = u64.mul(
                u64.rotl(u64.add((hi, lo), u64.mul(lane, u64.const(P64_2))), 31),
                u64.const(P64_1),
            )
            active = ((base + u) < stripes_of)[None, :]
            hi = jnp.where(active, nhi, hi)
            lo = jnp.where(active, nlo, lo)
        return (hi, lo), None

    (vhi, vlo), _ = jax.lax.scan(step, (vhi, vlo), (bases, lanes))
    accs = [(vhi[k], vlo[k]) for k in range(4)]

    has_stripes = lengths >= 32
    h_big = u64.add(
        u64.add(u64.rotl(accs[0], 1), u64.rotl(accs[1], 7)),
        u64.add(u64.rotl(accs[2], 12), u64.rotl(accs[3], 18)),
    )
    for v in accs:
        h_big = _merge_round64(h_big, v)
    z = zero[0]
    h_small = tuple(x + z for x in u64.add(seed64, u64.const(P64_5)))
    h = u64.where(has_stripes, h_big, h_small)
    h = u64.add_u32(h, lengths.astype(U32))

    # ----- tail: rem = len & 31 bytes starting at (len & ~31)
    base = lengths & ~31
    rem = lengths & 31
    # up to 3 × 8-byte groups
    for k in range(3):
        off = base + 8 * k
        idx = off[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
        lane = u64.from_le_bytes(_gather_bytes(data, jnp.minimum(idx, L - 1)))
        active = rem >= 8 * (k + 1)
        h2 = u64.xor(h, _round64(u64.const(0), lane))
        h2 = u64.add(u64.mul(u64.rotl(h2, 27), u64.const(P64_1)), u64.const(P64_4))
        h = u64.where(active, h2, h)
    # one 4-byte group
    off = base + (rem & ~7)
    idx = off[:, None] + jnp.arange(4, dtype=jnp.int32)[None, :]
    word = u64.u32_from_le_bytes(_gather_bytes(data, jnp.minimum(idx, L - 1)))
    active = (rem & 7) >= 4
    h2 = u64.xor(h, u64.mul((jnp.zeros_like(word), word), u64.const(P64_1)))
    h2 = u64.add(u64.mul(u64.rotl(h2, 23), u64.const(P64_2)), u64.const(P64_3))
    h = u64.where(active, h2, h)
    # up to 3 single bytes
    start = base + (rem & ~3)
    for k in range(3):
        idx = (start + k)[:, None]
        byte = _gather_bytes(data, jnp.minimum(idx, L - 1))[:, 0].astype(U32)
        active = (rem & 3) > k
        h2 = u64.xor(h, u64.mul((jnp.zeros_like(byte), byte), u64.const(P64_5)))
        h2 = u64.mul(u64.rotl(h2, 11), u64.const(P64_1))
        h = u64.where(active, h2, h)

    # avalanche
    h = u64.xor(h, u64.shr(h, 33))
    h = u64.mul(h, u64.const(P64_2))
    h = u64.xor(h, u64.shr(h, 29))
    h = u64.mul(h, u64.const(P64_3))
    h = u64.xor(h, u64.shr(h, 32))
    return h


def _rotl32(x, r: int):
    return (x << r) | (x >> (32 - r))


def xxh32(data, lengths, seed: int = 0):
    """Batched one-shot XXH32 → (B,) uint32."""
    B, L = data.shape
    assert L % (16 * UNROLL) == 0, L
    n_stripes = L // 16
    lengths = lengths.astype(jnp.int32)
    stripes_of = lengths // 16
    seed32 = jnp.uint32(seed)

    zero = (lengths * 0).astype(U32)[None, :]
    v = (
        jnp.stack(
            [seed32 + P32_1 + P32_2, seed32 + P32_2, seed32, seed32 - P32_1]
        )[:, None]
        + zero
    )  # (4, B)

    wT = _words_T(data)  # (L/4, B)
    lanes = wT.reshape(n_stripes // UNROLL, UNROLL, 4, B)
    bases = jnp.arange(0, n_stripes, UNROLL, dtype=jnp.int32)

    def step(carry, xs):
        v = carry
        base, lane_words = xs
        for u in range(UNROLL):
            nv = _rotl32(v + lane_words[u] * P32_2, 13) * P32_1
            active = ((base + u) < stripes_of)[None, :]
            v = jnp.where(active, nv, v)
        return v, None

    v, _ = jax.lax.scan(step, v, (bases, lanes))

    has_stripes = lengths >= 16
    h_big = _rotl32(v[0], 1) + _rotl32(v[1], 7) + _rotl32(v[2], 12) + _rotl32(v[3], 18)
    h = jnp.where(has_stripes, h_big, seed32 + P32_5)
    h = h + lengths.astype(U32)

    base = lengths & ~15
    rem = lengths & 15
    # up to 3 × 4-byte groups
    for k in range(3):
        off = base + 4 * k
        idx = off[:, None] + jnp.arange(4, dtype=jnp.int32)[None, :]
        word = u64.u32_from_le_bytes(_gather_bytes(data, jnp.minimum(idx, L - 1)))
        active = rem >= 4 * (k + 1)
        h2 = _rotl32(h + word * P32_3, 17) * P32_4
        h = jnp.where(active, h2, h)
    # up to 3 single bytes
    start = base + (rem & ~3)
    for k in range(3):
        idx = (start + k)[:, None]
        byte = _gather_bytes(data, jnp.minimum(idx, L - 1))[:, 0].astype(U32)
        active = (rem & 3) > k
        h2 = _rotl32(h + byte * P32_5, 11) * P32_1
        h = jnp.where(active, h2, h)

    h = h ^ (h >> 15)
    h = h * P32_2
    h = h ^ (h >> 13)
    h = h * P32_3
    h = h ^ (h >> 16)
    return h
