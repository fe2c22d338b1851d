"""Chunk-parallel LZ4 block encoder — JAX/TPU tier.

Format parity: reference lz4/Lz4RawCompressor.java:69-302 (token nibbles,
255-extension literal lengths, 2-byte LE offsets, last-literal rule — the
matcher margin guarantees the final ≥5 bytes are literals). Match finding
is the shared vectorized greedy matcher (ops/lz77_match_jax.py); matches
are capped at 64 bytes (nibble 15 + one extension byte covers up to 273, so
the cap costs nothing structurally — longer repetitions chain through
consecutive sequences at ~3 bytes per 64).

Emission mirrors ops/snappy_encode_jax.py: MXU prefix-sum layout, binary
search for the covering sequence, one vector pass computing every output
byte (token / literal-length extension / literals / offset / match-length
extension).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lz77_match_jax import _row_gather, greedy_matches
from .snappy_jax import _token_prefix_sum

I32 = jnp.int32
MAX_IN = 65536
MAX_MATCH = 64  # nibble 15 + 1 extension byte encodes up to 273


def max_compressed_length(n: int) -> int:
    return n + n // 255 + 16  # reference: Lz4RawCompressor.java:64-67


def _lit_ext_bytes(r):
    """Number of 255-extension bytes for a literal run of r (0 if ≤ 14)."""
    return jnp.where(r <= 14, 0, (r - 15) // 255 + 1)


@partial(jax.jit, static_argnames=("out_cap",))
def encode(data, lengths, out_cap: int | None = None):
    """Encode B lz4 blocks (≤64KB each) at once.

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

    lit_e = _lit_ext_bytes(run)
    m_nib = jnp.minimum(s_len - 4, 15)
    m_ext = jnp.where(s_len >= 19, 1, 0)  # one byte, value s_len - 19
    seq_bytes = jnp.where(seq_valid, 1 + lit_e + run + 2 + m_ext, 0)

    incl = _token_prefix_sum(seq_bytes)
    s_off = incl - seq_bytes
    body_end = incl[:, -1]
    t_lit_e = _lit_ext_bytes(trail)
    # empty input still emits the single 0x00 token (empty literal sequence)
    comp_lens = body_end + jnp.where(lengths > 0, 1 + t_lit_e + trail, 1)
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

    has_trail = (lengths > 0)[:, None]
    is_trail = (j >= body_end[:, None]) & has_trail
    g_off = jnp.where(is_trail, body_end[:, None], _row_gather(s_off, lo))
    g_run = jnp.where(is_trail, trail[:, None], _row_gather(run, lo))
    g_lit_e = _lit_ext_bytes(g_run)
    g_lit_src = jnp.where(is_trail, last_end[:, None], _row_gather(s_lit_src, lo))
    g_mlen = _row_gather(s_len, lo)
    g_dist = _row_gather(s_dist, lo)
    g_mnib = jnp.where(is_trail, 0, jnp.minimum(g_mlen - 4, 15))
    jr = j - g_off

    token = (jnp.minimum(g_run, 15) << 4) | jnp.maximum(g_mnib, 0)
    # literal-length extension byte k = jr-1: 255 while not last, then rest
    k = jr - 1
    ext_val = jnp.where(k < g_lit_e - 1, 255, g_run - 15 - 255 * jnp.maximum(g_lit_e - 1, 0))
    lit_byte = _row_gather(d, jnp.clip(g_lit_src + (jr - 1 - g_lit_e), 0, L - 1))
    off_k = jr - 1 - g_lit_e - g_run  # 0 or 1 within the offset field
    off_byte = jnp.where(off_k == 0, g_dist & 0xFF, g_dist >> 8)
    mext_byte = g_mlen - 19

    val = jnp.where(
        jr == 0, token,
        jnp.where(jr < 1 + g_lit_e, ext_val,
                  jnp.where(jr < 1 + g_lit_e + g_run, lit_byte,
                            jnp.where(off_k < 2, off_byte, mext_byte))))
    # trailing sequence has no offset/match fields
    val = jnp.where(is_trail & (jr >= 1 + g_lit_e + g_run), 0, val)
    val = jnp.where(j < comp_lens[:, None], val, 0)
    return val.astype(jnp.uint8), comp_lens
