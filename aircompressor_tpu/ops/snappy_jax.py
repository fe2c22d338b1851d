"""Chunk-parallel Snappy block decoder — JAX/TPU tier.

Format parity: reference snappy/SnappyRawDecompressor.java:30-220 (tag
dispatch, varint length, strict validation). The ALGORITHM is redesigned
around what this TPU executes at full memory bandwidth — bulk gathers and
fused elementwise ops. Scatters, sorts and native cumsum/cummax lower poorly
(measured ~100× slower than gathers here), so the pipeline avoids them
entirely:

  1. token geometry is computed AT EVERY BYTE POSITION from shifted views
     (pretend a token starts everywhere);
  2. jump tables next^(2^k) come from log2 rounds of gather composition;
     the actual token list is walked by a short ``lax.scan`` taking 64
     tokens per step, then expanded 64× by a gather tree — no scatter;
  3. per-token output offsets use a log-step shifted-add prefix sum over the
     (B, T) token axis;
  4. the covering token of every OUTPUT byte is found by branchless binary
     search over the offset table (log2(T) gather rounds);
  5. back-reference chains (copies referencing copies, including
     overlapping dist<len self-copies) resolve with log2(L) pointer-doubling
     gather rounds, after which one final gather materializes all chunks.

Every chunk in the (B, Lc) batch decodes independently in lockstep — the
batch axis is the parallel axis (Snappy's own 64KB framing chunks,
reference: SnappyFramedOutputStream 64KB max chunk).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

I32 = jnp.int32
MAX_OUT = 65536


def _shift(a, k):
    """a[:, i+k] with zero fill — static slice + pad."""
    if k == 0:
        return a
    B, L = a.shape
    pad = jnp.zeros((B, k), dtype=a.dtype)
    return jnp.concatenate([a[:, k:], pad], axis=1)


def _row_gather(a, idx):
    return jnp.take_along_axis(a, idx, axis=1, mode="clip")


BLOCK = 512


def _tri_psum(xf, tri):
    """Σ_s xf[..., s]·tri[t, s] with EXACT integer arithmetic on the MXU:
    the TPU's f32 matmul is lossy (bf16 passes), so split values into 8-bit
    limbs — each limb is bf16-exact, f32 accumulation over ≤2^15 terms of
    <2^8 values is exact — and recombine in int32."""
    acc = None
    x = xf.astype(jnp.int32)
    for k in range(3):
        limb = (x & 255).astype(jnp.float32)
        part = jax.lax.dot_general(
            limb, tri, (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32) << (8 * k)
        acc = part if acc is None else acc + part
        x = x >> 8
    return acc


def _token_prefix_sum(x):
    """Inclusive prefix sum along axis 1 — two-level triangular MATMUL on the
    MXU (shift-chains and native cumsum lower poorly here). Exact for sums
    < 2^24; token offsets are ≤ 64KB so this always holds."""
    B, T = x.shape
    Tp = ((T + BLOCK - 1) // BLOCK) * BLOCK
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T)))
    G = Tp // BLOCK
    xg = x.reshape(B, G, BLOCK)
    tri = jnp.tril(jnp.ones((BLOCK, BLOCK), jnp.float32))  # tri[t, s≤t] = 1
    within = _tri_psum(xg, tri)  # (B, G, BLOCK) inclusive within-block
    sums = within[:, :, -1]  # (B, G)
    tri_excl = jnp.tril(jnp.ones((G, G), jnp.float32), k=-1)
    offs = _tri_psum(sums, tri_excl)  # (B, G) exclusive block offsets
    out = (within + offs[:, :, None]).reshape(B, Tp).astype(x.dtype)
    return out[:, :T]


@partial(jax.jit, static_argnames=("out_cap", "rounds"))
def decode(comp, comp_lens, out_cap: int = MAX_OUT, rounds: int = 17):
    """Decode B snappy blocks at once.

    comp: (B, Lc) uint8 zero-padded (with varint length prefix);
    comp_lens: (B,) int32.
    Returns (out (B, out_cap) uint8, out_lens (B,) int32, ok (B,) bool).
    """
    B, Lc = comp.shape
    comp_lens = comp_lens.astype(I32)
    tag = comp.astype(I32)
    b1, b2, b3, b4 = (_shift(tag, k) for k in (1, 2, 3, 4))

    # ---- varint uncompressed length (≤5 bytes)
    conts = [tag[:, k] >= 128 for k in range(4)]
    vals = [tag[:, k] & 0x7F for k in range(5)]
    declared = vals[0]
    varint_len = jnp.ones((B,), I32)
    carry = conts[0]
    for k in range(1, 5):
        declared = jnp.where(carry, declared | (vals[k] << (7 * k)), declared)
        varint_len = varint_len + carry.astype(I32)
        if k < 4:
            carry = carry & conts[k]
    ok = (declared >= 0) & (declared <= out_cap) & (varint_len <= comp_lens)

    # ---- token geometry at every position
    ttype = tag & 3
    n = tag >> 2
    lit_extra = jnp.clip(n - 59, 0, 4)
    ext_len = jnp.where(
        lit_extra == 0, n + 1,
        jnp.where(
            lit_extra == 1, b1 + 1,
            jnp.where(
                lit_extra == 2, (b1 | (b2 << 8)) + 1,
                jnp.where(lit_extra == 3, (b1 | (b2 << 8) | (b3 << 16)) + 1,
                          (b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)) + 1))))
    is_lit = ttype == 0
    lit_len = jnp.where(is_lit, jnp.minimum(ext_len, out_cap + 1), 0)
    lit_start_rel = 1 + lit_extra
    c1_len = 4 + ((tag >> 2) & 7)
    c1_dist = ((tag >> 5) << 8) | b1
    c2_len = n + 1
    c2_dist = b1 | (b2 << 8)
    c4_dist = b1 | (b2 << 8) | (b3 << 16)
    copy_len = jnp.where(ttype == 1, c1_len, c2_len)
    dist = jnp.where(ttype == 1, c1_dist,
                     jnp.where(ttype == 2, c2_dist, c4_dist))
    bad4 = (ttype == 3) & (b4 != 0)
    token_size = jnp.where(
        is_lit, 1 + lit_extra + lit_len,
        jnp.where(ttype == 1, 2, jnp.where(ttype == 2, 3, 5)))
    out_adv = jnp.where(is_lit, lit_len, copy_len)

    pos = jnp.arange(Lc, dtype=I32)[None, :]
    end = comp_lens[:, None]
    nxt = jnp.where(pos >= end, pos,
                    jnp.minimum(pos + jnp.maximum(token_size, 1), end))

    # ---- jump tables next^(2^k), k = 0..5 → 64-token strides
    tables = [nxt]
    for _ in range(5):
        t = tables[-1]
        tables.append(_row_gather(t, jnp.minimum(t, Lc - 1)))
    J64 = _row_gather(tables[-1], jnp.minimum(tables[-1], Lc - 1))

    # ---- walk the token chain, 64 tokens per scan step
    T_max = Lc // 2 + 2
    S = (T_max + 63) // 64

    def step(p, _):
        np_ = _row_gather(J64, jnp.minimum(p[:, None], Lc - 1))[:, 0]
        return np_, p

    _, anchors = jax.lax.scan(step, varint_len, None, length=S)  # (S, B)

    # ---- expand anchors ×64 with the gather tree (interleave J32..J1)
    toks = anchors  # (S, B), stride 64
    for tbl in reversed(tables):  # J32, J16, J8, J4, J2, J1
        mid = jnp.take_along_axis(
            tbl, jnp.minimum(toks, Lc - 1).T, axis=1
        ).T
        toks = jnp.stack([toks, mid], axis=1).reshape(-1, toks.shape[1])
    toks_bt = toks.T  # (B, T) token input positions, T = 64*S
    T = toks_bt.shape[1]

    tok_valid = toks_bt < end
    tk = jnp.minimum(toks_bt, Lc - 1)

    # ---- per-token geometry + offsets
    t_adv = jnp.where(tok_valid, _row_gather(out_adv, tk), 0)
    incl = _token_prefix_sum(t_adv)
    t_off = incl - t_adv  # exclusive output offset per token
    out_lens = incl[:, -1]
    ok = ok & (out_lens == declared)

    t_is_lit = _row_gather(is_lit.astype(I32), tk) > 0
    t_dist = _row_gather(dist, tk)
    t_clen = _row_gather(copy_len, tk)
    t_size = _row_gather(token_size, tk)
    t_lit_start = tk + _row_gather(lit_start_rel, tk)  # (B, T)
    bad_copy = tok_valid & (~t_is_lit) & (
        (t_dist <= 0) | (t_dist > t_off) | (t_off + t_clen > out_cap))
    bad_span = tok_valid & (tk + t_size > end)
    bad_t4 = tok_valid & (_row_gather(bad4.astype(I32), tk) > 0)
    ok = ok & ~jnp.any(bad_copy | bad_span | bad_t4, axis=1)

    # ---- covering token per output byte: branchless binary search on t_off
    Lo = out_cap
    j = jnp.arange(Lo, dtype=I32)[None, :]
    lo = jnp.zeros((B, Lo), I32)
    bit = 1
    while bit < T:
        bit <<= 1
    bit >>= 1
    while bit:
        mid = lo + bit
        mid_off = _row_gather(t_off, jnp.minimum(mid, T - 1))
        mid_ok = (mid < T) & (mid_off <= j) & _row_gather(tok_valid, jnp.minimum(mid, T - 1))
        lo = jnp.where(mid_ok, mid, lo)
        bit >>= 1

    g_off = _row_gather(t_off, lo)
    g_is_lit = _row_gather(t_is_lit.astype(I32), lo) > 0
    g_dist = _row_gather(t_dist, lo)
    g_lit_start = _row_gather(t_lit_start, lo)
    jr = j - g_off
    lit_src = g_lit_start + jr
    copy_src = j - g_dist
    produced = j < out_lens[:, None]
    resolved = g_is_lit | ~produced
    ptr = jnp.where(resolved, j, jnp.maximum(copy_src, 0))
    for _ in range(rounds):
        ptr = _row_gather(ptr, ptr)
    final_src = _row_gather(lit_src, ptr)
    out = _row_gather(comp, jnp.clip(final_src, 0, Lc - 1))
    out = jnp.where(produced, out, 0)
    return out, jnp.where(ok, out_lens, 0), ok
