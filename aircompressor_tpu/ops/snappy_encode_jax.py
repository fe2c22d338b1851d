"""Chunk-parallel Snappy block encoder — JAX/TPU tier.

Format parity: reference snappy/SnappyRawCompressor.java:74-345 (varint
prefix, literal tags with extension bytes, COPY_1/COPY_2 ops). Match
finding is the shared vectorized greedy matcher (ops/lz77_match_jax.py);
matches are capped at 64 bytes = one snappy copy op (longer repetitions
chain through consecutive committed matches at the same per-64-byte cost as
the reference's emitCopy chunking, SnappyRawCompressor.java:312-345).

Emission: per-sequence byte layout by an MXU prefix sum; every output byte
finds its covering sequence by branchless binary search and computes its own
value (header / literal / copy-op bytes) in one vector pass — no scatters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lz77_match_jax import _row_gather, greedy_matches
from .snappy_jax import _token_prefix_sum

I32 = jnp.int32
MAX_IN = 65536
MAX_MATCH = 64


def max_compressed_length(n: int) -> int:
    return 32 + n + n // 6  # reference: SnappyRawCompressor.java:47-70


@partial(jax.jit, static_argnames=("out_cap",))
def encode(data, lengths, out_cap: int | None = None):
    """Encode B blocks (≤64KB each) at once.

    data: (B, L) uint8 zero-padded; lengths: (B,) int32.
    Returns (comp (B, out_cap) uint8, comp_lens (B,) int32).
    """
    B, L = data.shape
    assert L <= MAX_IN
    if out_cap is None:
        out_cap = max_compressed_length(L)
    lengths = lengths.astype(I32)
    d = data.astype(I32)

    m = greedy_matches(d, lengths, MAX_MATCH)
    seq_valid, s_len, s_dist = m["seq_valid"], m["len"], m["dist"]
    run, s_lit_src = m["run"], m["lit_src"]
    last_end, trail = m["last_end"], m["trail"]

    def lit_hdr(r):
        return jnp.where(r == 0, 0,
                         jnp.where(r <= 60, 1, jnp.where(r <= 256, 2, 3)))

    hl = lit_hdr(run)
    is_c1 = (s_len <= 11) & (s_dist < 2048)
    opb = jnp.where(is_c1, 2, 3)
    seq_bytes = jnp.where(seq_valid, hl + run + opb, 0)

    decl = lengths
    vbytes = jnp.where(decl < (1 << 7), 1, jnp.where(decl < (1 << 14), 2, 3))

    incl = _token_prefix_sum(seq_bytes)
    s_off = vbytes[:, None] + incl - seq_bytes
    body_end = vbytes + incl[:, -1]
    thl = lit_hdr(trail)
    comp_lens = body_end + thl + trail
    T = s_off.shape[1]

    # ---- per-output-byte value via binary search on s_off
    Co = out_cap
    j = jnp.arange(Co, dtype=I32)[None, :]
    lo = jnp.zeros((B, Co), I32)
    bit = 1
    while bit < T:
        bit <<= 1
    bit >>= 1
    while bit:
        mid = lo + bit
        mo = _row_gather(s_off, jnp.minimum(mid, T - 1))
        lo = jnp.where((mid < T) & (mo <= j), mid, lo)
        bit >>= 1

    is_trail = (j >= body_end[:, None]) & (trail > 0)[:, None]
    g_off = jnp.where(is_trail, body_end[:, None], _row_gather(s_off, lo))
    g_run = jnp.where(is_trail, trail[:, None], _row_gather(run, lo))
    g_hl = lit_hdr(g_run)
    g_lit_src = jnp.where(is_trail, last_end[:, None], _row_gather(s_lit_src, lo))
    g_mlen = _row_gather(s_len, lo)
    g_dist = _row_gather(s_dist, lo)
    g_c1 = (~is_trail) & (_row_gather(is_c1.astype(I32), lo) > 0)
    jr = j - g_off

    nlit = jnp.maximum(g_run - 1, 0)
    lh0 = jnp.where(g_run <= 60, nlit << 2,
                    jnp.where(g_run <= 256, 60 << 2, 61 << 2))
    hdr_byte = jnp.where(jr == 0, lh0,
                         jnp.where(jr == 1, nlit & 0xFF, nlit >> 8))
    lit_byte = _row_gather(d, jnp.clip(g_lit_src + (jr - g_hl), 0, L - 1))
    kr = jr - g_hl - g_run
    c1b0 = 1 | ((g_mlen - 4) << 2) | ((g_dist >> 8) << 5)
    c2b0 = 2 | ((g_mlen - 1) << 2)
    copy_byte = jnp.where(
        g_c1,
        jnp.where(kr == 0, c1b0, g_dist & 0xFF),
        jnp.where(kr == 0, c2b0,
                  jnp.where(kr == 1, g_dist & 0xFF, g_dist >> 8)))
    val = jnp.where(jr < g_hl, hdr_byte,
                    jnp.where(jr < g_hl + g_run, lit_byte, copy_byte))

    v0 = jnp.where(vbytes == 1, decl & 0x7F, (decl & 0x7F) | 0x80)
    v1 = jnp.where(vbytes == 2, (decl >> 7) & 0x7F, ((decl >> 7) & 0x7F) | 0x80)
    v2 = (decl >> 14) & 0x7F
    val = jnp.where(j == 0, v0[:, None], val)
    val = jnp.where((j == 1) & (vbytes[:, None] > 1), v1[:, None], val)
    val = jnp.where((j == 2) & (vbytes[:, None] > 2), v2[:, None], val)
    val = jnp.where(j < comp_lens[:, None], val, 0)
    return val.astype(jnp.uint8), comp_lens
