"""Batched xxHash64 — Pallas TPU kernel tier.

One kernel launch hashes a whole batch: the grid tiles the batch axis in
LANE-sized groups of 128 streams; each program keeps the four xxh64
accumulators for its 128 streams as (8, 128) u32 VPU tiles (rows 0-3 = lane
highs, rows 4-7 = lane lows) and walks the stripe axis with aligned (8, 128)
loads from the word-transposed input. The merge/tail/avalanche finalization
is delegated to the jnp tail logic in ops/xxhash_jax (tiny, once per batch).

Why Pallas here: the stripe loop is the hot part of every frame checksum
(zstd frames hash all content — reference: zstd/XxHash64.java) and as a
single fused kernel it costs ONE launch on the relay-attached TPU, where
per-program round trips dominate (see bench.py notes).

Layout contract: ``words`` is the (L/4, B) u32 transpose produced by
xxhash_jax._words_T — row 8s+k is word k of stripe s across the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64
from .xxhash_jax import P64_1, P64_2, _words_T, xxh64 as _xxh64_ref

LANES = 128
U32 = jnp.uint32


def _mul64(hi_a, lo_a, c: int):
    """(hi,lo) tiles × 64-bit constant (mod 2^64)."""
    return u64.mul((hi_a, lo_a), u64.const(c))


def _stripe_kernel(nstripes_ref, words_ref, state_ref):
    """Accumulate xxh64 v1..v4 over all full stripes for 128 streams."""
    n_stripes_max = words_ref.shape[0] // 8

    seed_hi, seed_lo = u64.const(0)
    inits = [
        u64.add((seed_hi, seed_lo), u64.const((P64_1 + P64_2) & 0xFFFFFFFFFFFFFFFF)),
        u64.add((seed_hi, seed_lo), u64.const(P64_2)),
        (seed_hi, seed_lo),
        u64.sub((seed_hi, seed_lo), u64.const(P64_1)),
    ]
    ones = jnp.ones((LANES,), U32)
    his = jnp.stack([v[0] * ones for v in inits])  # (4, 128)
    los = jnp.stack([v[1] * ones for v in inits])
    counts = nstripes_ref[0, :]  # (128,) stripes per stream

    def body(s, carry):
        his, los = carry
        lanes = words_ref[pl.ds(8 * s, 8), :]  # (8, 128): [lo0,hi0,lo1,hi1,...]
        pairs = lanes.reshape(4, 2, LANES)
        l_lo = pairs[:, 0, :]  # (4, 128)
        l_hi = pairs[:, 1, :]
        nhi, nlo = u64.mul(
            u64.rotl(u64.add((his, los), u64.mul((l_hi, l_lo), u64.const(P64_2))), 31),
            u64.const(P64_1),
        )
        active = jnp.broadcast_to((s < counts)[None, :], (4, LANES))
        return jnp.where(active, nhi, his), jnp.where(active, nlo, los)

    his, los = jax.lax.fori_loop(0, n_stripes_max, body, (his, los))
    state_ref[0:4, :] = his
    state_ref[4:8, :] = los


@partial(jax.jit, static_argnames=())
def xxh64(data, lengths):
    """Batched one-shot XXH64 via the Pallas stripe kernel.

    Same contract as xxhash_jax.xxh64 (seed 0): data (B, L) uint8
    zero-padded with L % 256 == 0 and B % 128 == 0; lengths (B,) int32.
    Returns (hi, lo) uint32 pairs, bit-identical to the scalar tier.
    """
    B, L = data.shape
    assert B % LANES == 0, B
    assert L % 256 == 0, L
    lengths = lengths.astype(jnp.int32)
    wT = _words_T(data)  # (L/4, B) u32
    G = B // LANES
    # counts replicated to (8G, 128) so the block keeps legal (8, 128) tiling
    stripes_of = jnp.broadcast_to(
        (lengths // 32).reshape(G, 1, LANES), (G, 8, LANES)
    ).reshape(8 * G, LANES).astype(jnp.int32)

    state = pl.pallas_call(
        _stripe_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L // 4, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * G, LANES), U32),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(stripes_of, wT)

    # (8G, 128) → per-stream accumulators (4, B)
    st = state.reshape(G, 8, LANES)
    vhi = jnp.concatenate([st[g, 0:4, :] for g in range(G)], axis=1)  # (4, B)
    vlo = jnp.concatenate([st[g, 4:8, :] for g in range(G)], axis=1)
    return _finalize(data, lengths, vhi, vlo)


def _finalize(data, lengths, vhi, vlo):
    """Merge + tail + avalanche — identical math to xxhash_jax.xxh64."""
    from . import xxhash_jax as xj

    B, L = data.shape
    accs = [(vhi[k], vlo[k]) for k in range(4)]
    has_stripes = lengths >= 32
    h_big = u64.add(
        u64.add(u64.rotl(accs[0], 1), u64.rotl(accs[1], 7)),
        u64.add(u64.rotl(accs[2], 12), u64.rotl(accs[3], 18)),
    )
    for v in accs:
        h_big = xj._merge_round64(h_big, v)
    zero = (lengths * 0).astype(U32)
    h_small = tuple(x + zero for x in u64.add(u64.const(0), u64.const(xj.P64_5)))
    h = u64.where(has_stripes, h_big, h_small)
    h = u64.add_u32(h, lengths.astype(U32))

    base = lengths & ~31
    rem = lengths & 31
    for k in range(3):
        off = base + 8 * k
        idx = off[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
        lane = u64.from_le_bytes(xj._gather_bytes(data, jnp.minimum(idx, L - 1)))
        active = rem >= 8 * (k + 1)
        h2 = u64.xor(h, xj._round64(u64.const(0), lane))
        h2 = u64.add(u64.mul(u64.rotl(h2, 27), u64.const(P64_1)), u64.const(xj.P64_4))
        h = u64.where(active, h2, h)
    off = base + (rem & ~7)
    idx = off[:, None] + jnp.arange(4, dtype=jnp.int32)[None, :]
    word = u64.u32_from_le_bytes(xj._gather_bytes(data, jnp.minimum(idx, L - 1)))
    active = (rem & 7) >= 4
    h2 = u64.xor(h, u64.mul((jnp.zeros_like(word), word), u64.const(P64_1)))
    h2 = u64.add(u64.mul(u64.rotl(h2, 23), u64.const(P64_2)), u64.const(xj.P64_3))
    h = u64.where(active, h2, h)
    start = base + (rem & ~3)
    for k in range(3):
        idx = (start + k)[:, None]
        byte = xj._gather_bytes(data, jnp.minimum(idx, L - 1))[:, 0].astype(U32)
        active = (rem & 3) > k
        h2 = u64.xor(h, u64.mul((jnp.zeros_like(byte), byte), u64.const(xj.P64_5)))
        h2 = u64.mul(u64.rotl(h2, 11), u64.const(P64_1))
        h = u64.where(active, h2, h)

    h = u64.xor(h, u64.shr(h, 33))
    h = u64.mul(h, u64.const(P64_2))
    h = u64.xor(h, u64.shr(h, 29))
    h = u64.mul(h, u64.const(xj.P64_3))
    h = u64.xor(h, u64.shr(h, 32))
    return h
