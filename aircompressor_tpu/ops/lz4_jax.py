"""Chunk-parallel LZ4 block decoder — JAX/TPU tier.

Format parity: reference lz4/Lz4RawDecompressor.java:35-198 (token nibbles,
255-extension lengths, 2-byte LE offsets, last-sequence literal rule).
Same scatter-free TPU design as ops/snappy_jax.py (see its module docstring):
geometry-everywhere → jump-table token walk (64 tokens per scan step +
gather-tree expansion) → MXU prefix-sum offsets → binary-search covering
token → pointer-doubling back-reference resolution → one final gather.

The LZ4-specific piece is the 255-run extension length: the run of 0xFF
bytes starting at any position comes from one log-step suffix-minimum over
non-0xFF positions, turning the variable-length length encodings into
closed-form elementwise expressions. Each sequence covers literals THEN a
match, so an output byte is a literal when its token-relative offset is
below the literal length and a back-reference otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .snappy_jax import _row_gather, _shift, _token_prefix_sum

I32 = jnp.int32


def _suffix_min(x):
    B, L = x.shape
    k = 1
    big = jnp.iinfo(x.dtype).max
    while k < L:
        shifted = jnp.concatenate(
            [x[:, k:], jnp.full((B, k), big, x.dtype)], axis=1)
        x = jnp.minimum(x, shifted)
        k *= 2
    return x


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

    # 0xFF-run lengths: next non-FF index via suffix minimum
    nonff = jnp.where((d != 0xFF) | (pos >= end), pos, Lc)
    nf = _suffix_min(nonff)
    ff_run = nf - pos
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
    lo_b = _row_gather(d, jnp.minimum(off_pos, Lc - 1))
    hi_b = _row_gather(d, jnp.minimum(off_pos + 1, Lc - 1))
    dist = lo_b | (hi_b << 8)
    mext_pos = jnp.minimum(off_pos + 2, Lc - 1)
    ffm = _row_gather(ff_run, mext_pos)
    ffm_byte = _row_gather(nf_byte, mext_pos)
    ext_m = jnp.where(match_base == 15, ffm + 1, 0)
    mlen = jnp.where(match_base == 15,
                     jnp.minimum(19 + 255 * ffm + ffm_byte, out_cap),
                     match_base + 4)

    is_last = off_pos >= end  # final sequence: literals only
    token_size = jnp.where(is_last, 1 + ext_l + lit_len,
                           1 + ext_l + lit_len + 2 + ext_m)
    out_adv = jnp.where(is_last, lit_len, lit_len + mlen)
    nxt = jnp.where(pos >= end, pos,
                    jnp.minimum(pos + jnp.maximum(token_size, 1), end))

    # ---- token walk: jump tables + scan + gather-tree expansion
    tables = [nxt]
    for _ in range(5):
        t = tables[-1]
        tables.append(_row_gather(t, jnp.minimum(t, Lc - 1)))
    J64 = _row_gather(tables[-1], jnp.minimum(tables[-1], Lc - 1))
    T_max = Lc // 3 + 3  # mid-stream tokens are ≥ 3 bytes (token + offset)
    S = (T_max + 63) // 64

    def step(p, _):
        return _row_gather(J64, jnp.minimum(p[:, None], Lc - 1))[:, 0], p

    _, anchors = jax.lax.scan(step, comp_lens * 0, None, length=S)
    toks = anchors
    for tbl in reversed(tables):
        mid = jnp.take_along_axis(tbl, jnp.minimum(toks, Lc - 1).T, axis=1).T
        toks = jnp.stack([toks, mid], axis=1).reshape(-1, toks.shape[1])
    toks_bt = toks.T
    T = toks_bt.shape[1]
    tok_valid = (toks_bt < end) & (comp_lens > 0)[:, None]
    tk = jnp.minimum(toks_bt, Lc - 1)

    # ---- per-token geometry + offsets
    t_adv = jnp.where(tok_valid, jnp.minimum(_row_gather(out_adv, tk), out_cap + 1), 0)
    incl = _token_prefix_sum(t_adv)
    t_off = incl - t_adv
    out_lens = incl[:, -1]

    t_lit_len = _row_gather(lit_len, tk)
    t_lit_start = _row_gather(lit_start, tk)
    t_dist = _row_gather(dist, tk)
    t_is_last = _row_gather(is_last.astype(I32), tk) > 0
    t_size = _row_gather(token_size, tk)
    bad = tok_valid & (
        (_row_gather(lit_start + lit_len, tk) > end)
        | (~t_is_last & ((t_dist <= 0) | (t_dist > t_off + t_lit_len)
                         | (_row_gather(off_pos, tk) + 2 > end)))
        | (t_off + t_adv > out_cap)
    )
    ok = ~jnp.any(bad, axis=1) & (out_lens <= out_cap) & (comp_lens > 0)

    # ---- covering token per output byte (binary search on t_off)
    Lo = out_cap
    j = jnp.arange(Lo, dtype=I32)[None, :]
    lo = jnp.zeros((B, Lo), I32)
    bit = 1
    while bit < T:
        bit <<= 1
    bit >>= 1
    while bit:
        mid = lo + bit
        mo = _row_gather(t_off, jnp.minimum(mid, T - 1))
        mok = (mid < T) & (mo <= j) & _row_gather(tok_valid, jnp.minimum(mid, T - 1))
        lo = jnp.where(mok, mid, lo)
        bit >>= 1

    g_off = _row_gather(t_off, lo)
    g_lit_len = _row_gather(t_lit_len, lo)
    g_lit_start = _row_gather(t_lit_start, lo)
    g_dist = _row_gather(t_dist, lo)
    jr = j - g_off
    in_lit = jr < g_lit_len
    lit_src = g_lit_start + jr
    copy_src = j - g_dist
    produced = j < out_lens[:, None]
    resolved = in_lit | ~produced
    ptr = jnp.where(resolved, j, jnp.maximum(copy_src, 0))
    for _ in range(rounds):
        ptr = _row_gather(ptr, ptr)
    final_src = _row_gather(lit_src, ptr)
    out = _row_gather(comp, jnp.clip(final_src, 0, Lc - 1))
    out = jnp.where(produced, out, 0)
    return out, jnp.where(ok, out_lens, 0), ok
