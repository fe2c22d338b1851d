"""Chunk-parallel LZ4 block decoder — JAX/TPU tier.

Format parity: reference lz4/Lz4RawDecompressor.java:35-198 (token nibbles,
255-extension lengths, 2-byte LE offsets, last-sequence literal rule).
Same TPU-native two-pass design as ops/snappy_jax.py:

  geometry-everywhere → orbit marking (pointer doubling) → prefix-sum
  output offsets → per-output-byte source resolution (scatter + cummax +
  pointer doubling over back-reference chains) → one final gather.

The LZ4-specific piece is the 255-run extension length: the run of 0xFF
bytes starting at any position is computed for ALL positions at once with a
reverse running-minimum over non-0xFF positions, so the variable-length
length encodings become closed-form elementwise expressions.

Each sequence covers literals THEN a match, so an output byte's source is
literal when its token-relative offset is below the literal length and a
back-reference otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

I32 = jnp.int32


def _shift(a, k):
    if k == 0:
        return a
    B, L = a.shape
    pad = jnp.zeros((B, k), dtype=a.dtype)
    return jnp.concatenate([a[:, k:], pad], axis=1)


def _row_gather(a, idx):
    return jnp.take_along_axis(a, idx, axis=1, mode="clip")


def _row_scatter_max(dst, idx, val):
    B = dst.shape[0]
    rows = jnp.arange(B, dtype=I32)[:, None]
    return dst.at[rows, idx].max(val, mode="drop")


@partial(jax.jit, static_argnames=("out_cap", "rounds"))
def decode(comp, comp_lens, out_cap: int = 65536, rounds: int = 17):
    """Decode B lz4 blocks at once.

    comp: (B, Lc) uint8 zero-padded; comp_lens: (B,) int32.
    Returns (out (B, out_cap) uint8, out_lens (B,), ok (B,) bool).
    """
    B, Lc = comp.shape
    comp_lens = comp_lens.astype(I32)
    d = comp.astype(I32)
    pos = jnp.arange(Lc, dtype=I32)[None, :]
    end = comp_lens[:, None]

    # run of 0xFF bytes starting at each position: next non-FF index
    nonff = jnp.where((d != 0xFF) | (pos >= end), pos, Lc)
    nf = jax.lax.cummin(nonff[:, ::-1], axis=1)[:, ::-1]
    ff_run = nf - pos  # 0 when d[pos] != 0xFF
    nf_byte = _row_gather(d, jnp.minimum(nf, Lc - 1))

    # ---- token geometry at every position
    lit_base = d >> 4
    match_base = d & 15
    p1 = jnp.minimum(pos + 1, Lc - 1)
    ffl = _row_gather(ff_run, p1)
    ffl_byte = _row_gather(nf_byte, p1)
    ext_l = jnp.where(lit_base == 15, ffl + 1, 0)
    lit_len = jnp.where(lit_base == 15,
                        jnp.minimum(15 + 255 * ffl + ffl_byte, out_cap + Lc),
                        lit_base)
    lit_start = pos + 1 + ext_l
    off_pos = lit_start + lit_len
    lo = _row_gather(d, jnp.minimum(off_pos, Lc - 1))
    hi = _row_gather(d, jnp.minimum(off_pos + 1, Lc - 1))
    dist = lo | (hi << 8)
    mext_pos = jnp.minimum(off_pos + 2, Lc - 1)
    ffm = _row_gather(ff_run, mext_pos)
    ffm_byte = _row_gather(nf_byte, mext_pos)
    ext_m = jnp.where(match_base == 15, ffm + 1, 0)
    mlen = jnp.where(match_base == 15,
                     jnp.minimum(19 + 255 * ffm + ffm_byte, out_cap),
                     match_base + 4)

    is_last = off_pos >= end  # final sequence: literals only, stream ends
    token_size = jnp.where(is_last, 1 + ext_l + lit_len,
                           1 + ext_l + lit_len + 2 + ext_m)
    out_adv = jnp.where(is_last, lit_len, lit_len + mlen)

    nxt = jnp.minimum(pos + jnp.maximum(token_size, 1), Lc - 1)
    nxt = jnp.where((pos >= end) | is_last, jnp.minimum(end, Lc - 1), nxt)
    nxt = jnp.where(pos >= end, pos, nxt)

    # ---- orbit marking from position 0
    empty = comp_lens == 0
    mask = (pos == 0) & (~empty)[:, None]
    m = mask.astype(I32)
    jump = nxt
    for _ in range(rounds):
        m = _row_scatter_max(m, jump, m)
        jump = _row_gather(jump, jump)
    mask = (m > 0) & (pos < end)

    # ---- output offsets
    contrib = jnp.where(mask, jnp.minimum(out_adv, out_cap), 0)
    csum = jnp.cumsum(contrib, axis=1, dtype=I32)
    out_off = csum - contrib
    out_lens = csum[:, -1]

    # validation (reference rules: offset within produced output, token spans
    # inside the input, output within capacity)
    lit_end_out = out_off + lit_len
    bad = mask & (
        (lit_start + lit_len > end)
        | (~is_last & ((dist <= 0) | (dist > lit_end_out)
                       | (off_pos + 2 > end)))
        | (out_off + out_adv > out_cap)
    )
    ok = ~jnp.any(bad, axis=1) & (out_lens <= out_cap)

    # ---- covering token per output byte
    Lo = out_cap
    opos = jnp.arange(Lo, dtype=I32)[None, :]
    tok_at = jnp.full((B, Lo), -1, dtype=I32)
    tok_at = _row_scatter_max(
        tok_at, jnp.where(mask & (out_adv > 0), out_off, Lo),
        jnp.where(mask & (out_adv > 0), pos, -1))
    t_of_j = jax.lax.cummax(tok_at, axis=1)

    t = jnp.maximum(t_of_j, 0)
    t_out_off = _row_gather(out_off, t)
    t_lit_len = _row_gather(lit_len, t)
    t_lit_start = _row_gather(lit_start, t)
    t_dist = _row_gather(dist, t)
    jr = opos - t_out_off
    in_lit = jr < t_lit_len
    lit_src = t_lit_start + jr  # literal source in input
    copy_src = opos - t_dist
    resolved = in_lit | (t_of_j < 0)
    ptr = jnp.where(resolved, opos, jnp.maximum(copy_src, 0))
    for _ in range(rounds):
        ptr = _row_gather(ptr, ptr)
    final_src = _row_gather(lit_src, ptr)
    out = _row_gather(comp, jnp.clip(final_src, 0, Lc - 1))
    out = jnp.where(opos < out_lens[:, None], out, 0)
    return out, jnp.where(ok, out_lens, 0), ok
