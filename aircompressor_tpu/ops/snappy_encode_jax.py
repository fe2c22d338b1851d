"""Chunk-parallel Snappy block encoder — JAX/TPU tier.

Format parity: reference snappy/SnappyRawCompressor.java:74-345 (varint
prefix, literal tags with extension bytes, COPY_1/COPY_2 ops). The match
pipeline is the TPU-native redesign of the reference's sequential
hash-table loop (SURVEY.md §7 "vectorized hash-table kernel"), built from
the primitives this hardware runs at full bandwidth (bulk gathers, fused
elementwise, short scans, MXU matmuls) with no scatters:

  1. hash a 4-byte window at every position (elementwise);
  2. candidate = nearest previous position with the same hash, via one
     stable per-row argsort over packed (hash, position) keys — the
     parallel equivalent of last-write-wins hash-table probing;
  3. match lengths by 4-byte compare rounds (bulk gathers), capped at 64 =
     one snappy copy op (longer repetitions chain through consecutive
     committed matches at the same per-64-byte cost as the reference's
     emitCopy chunking);
  4. greedy non-overlapping commit: first-match-at-or-after every position
     by a log-step suffix-minimum, then the commit chain
     g(x) = nextm(x) + len(nextm(x)) is walked 64 sequences per
     ``lax.scan`` step through pre-composed jump tables and expanded back
     with a gather tree — the sequence list IS the result (no orbit
     scatter);
  5. per-sequence byte layout by an MXU prefix sum; every output byte then
     finds its covering sequence by branchless binary search and computes
     its own value (header / literal / copy-op bytes) in one vector pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .snappy_jax import _token_prefix_sum

I32 = jnp.int32
MAX_IN = 65536
HASH_BITS = 14
MIN_MATCH = 4
MAX_MATCH = 64
MARGIN = 12


def max_compressed_length(n: int) -> int:
    return 32 + n + n // 6  # reference: SnappyRawCompressor.java:47-70


def _shift(a, k):
    if k == 0:
        return a
    B, L = a.shape
    pad = jnp.zeros((B, k), dtype=a.dtype)
    return jnp.concatenate([a[:, k:], pad], axis=1)


def _row_gather(a, idx):
    return jnp.take_along_axis(a, idx, axis=1, mode="clip")


def _suffix_min(x):
    """s[i] = min(x[i:]) via log-step shifted minima (pad-shifts only)."""
    B, L = x.shape
    k = 1
    big = jnp.iinfo(x.dtype).max
    while k < L:
        shifted = jnp.concatenate(
            [x[:, k:], jnp.full((B, k), big, x.dtype)], axis=1)
        x = jnp.minimum(x, shifted)
        k *= 2
    return x


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
    pos = jnp.arange(L, dtype=I32)[None, :]
    end = lengths[:, None]

    # ---- 1. hashes
    b1, b2, b3 = _shift(d, 1), _shift(d, 2), _shift(d, 3)
    w4 = (d | (b1 << 8) | (b2 << 16) | (b3 << 24)).astype(jnp.uint32)
    h = ((w4 * jnp.uint32(0x1E35A7BD)) >> jnp.uint32(32 - HASH_BITS)).astype(I32)

    # ---- 2. nearest previous same-hash position (argsort join)
    can_start = pos + MIN_MATCH + MARGIN <= end
    key = jnp.where(
        can_start,
        (h.astype(jnp.uint32) << 17) | pos.astype(jnp.uint32),
        jnp.uint32(0x80000000) | pos.astype(jnp.uint32),
    )
    perm = jnp.argsort(key, axis=1).astype(I32)
    key_sorted = _row_gather(key, perm)
    prev_perm = jnp.concatenate([perm[:, :1], perm[:, :-1]], axis=1)
    same_h = jnp.concatenate(
        [jnp.zeros((B, 1), bool),
         (key_sorted[:, 1:] >> 17) == (key_sorted[:, :-1] >> 17)], axis=1)
    same_h = same_h & (key_sorted < jnp.uint32(0x80000000))
    # invert the permutation with a gather: inv[perm[k]] = k, computed as
    # inv = argsort(perm) (perm is a permutation → argsort inverts it)
    inv = jnp.argsort(perm, axis=1).astype(I32)
    cand_sorted = jnp.where(same_h, prev_perm, -1)
    cand = _row_gather(cand_sorted, inv)
    cand_ok = (cand >= 0) & (_row_gather(w4, jnp.maximum(cand, 0)) == w4) & can_start

    # ---- 3. match lengths (4-byte rounds, cap MAX_MATCH)
    mlen = jnp.where(cand_ok, MIN_MATCH, 0)
    grow = cand_ok
    for _ in range(MAX_MATCH // 4 - 1):
        p4 = _row_gather(w4, jnp.minimum(pos + mlen, L - 1))
        c4 = _row_gather(w4, jnp.minimum(jnp.maximum(cand, 0) + mlen, L - 1))
        x = p4 ^ c4
        inb = pos + mlen + 4 <= end - 8
        full = grow & (x == 0) & inb
        beq = (((x & 0xFF) == 0).astype(I32)
               + ((x & 0xFFFF) == 0).astype(I32)
               + ((x & 0xFFFFFF) == 0).astype(I32))
        mlen = jnp.where(full, mlen + 4,
                         jnp.where(grow & (x != 0) & inb, mlen + beq, mlen))
        grow = full
    valid = cand_ok & (mlen >= MIN_MATCH)
    mlen = jnp.where(valid, jnp.minimum(mlen, MAX_MATCH), 0)
    dist = jnp.where(valid, pos - cand, 1)

    # ---- 4. greedy commit chain
    BIG = I32(L)
    mpos = jnp.where(valid, pos, BIG)
    nextm = _suffix_min(mpos)  # first match position ≥ x
    nm = jnp.minimum(nextm, L - 1)
    g = jnp.where(nextm < BIG, jnp.minimum(nm + _row_gather(mlen, nm), L - 1), L - 1)
    # jump tables g^(2^k) → 64-seq strides
    tables = [g]
    for _ in range(5):
        t = tables[-1]
        tables.append(_row_gather(t, t))
    J64 = _row_gather(tables[-1], tables[-1])
    T2 = L // 4 + 2  # ≤ one commit per 4 bytes
    S = (T2 + 63) // 64

    def step(p, _):
        return _row_gather(J64, p[:, None])[:, 0], p

    _, anchors = jax.lax.scan(step, jnp.zeros((B,), I32), None, length=S)
    toks = anchors  # (S, B)
    for tbl in reversed(tables):
        mid = jnp.take_along_axis(tbl, toks.T, axis=1).T
        toks = jnp.stack([toks, mid], axis=1).reshape(-1, toks.shape[1])
    anchors_bt = toks.T  # (B, T) anchor positions, T = 64*S
    T = anchors_bt.shape[1]

    # committed sequence = first match at/after each anchor
    sp = _row_gather(nextm, jnp.minimum(anchors_bt, L - 1))
    seq_valid = (sp < BIG) & (anchors_bt < end)
    sp_c = jnp.minimum(sp, L - 1)
    s_len = jnp.where(seq_valid, _row_gather(mlen, sp_c), 0)
    s_dist = _row_gather(dist, sp_c)
    # previous sequence end (the token list is ordered; no running max needed)
    s_end = jnp.where(seq_valid, sp + s_len, -1)
    prev_end = jnp.concatenate([jnp.zeros((B, 1), I32), s_end[:, :-1]], axis=1)
    prev_end = jnp.maximum(prev_end, 0)
    # anchors are exactly previous ends, so run = sp - anchor
    run = jnp.where(seq_valid, sp - jnp.where(anchors_bt < 0, 0, anchors_bt), 0)
    run = jnp.maximum(run, 0)

    # ---- 5. emission layout
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
    s_off = vbytes[:, None] + incl - seq_bytes  # output start per sequence
    body_end = vbytes + incl[:, -1]

    # trailing literals after the last committed sequence
    n_seq_bytes = jnp.max(jnp.where(seq_valid, s_end, 0), axis=1)
    last_end = jnp.maximum(n_seq_bytes, 0)
    trail = jnp.maximum(lengths - last_end, 0)
    thl = lit_hdr(trail)
    comp_lens = body_end + thl + trail

    s_lit_src = jnp.where(seq_valid, sp - run, 0)

    # ---- per-output-byte: covering sequence via binary search on s_off
    # (invalid tail entries share the final cumsum value == body_end, so for
    # j < body_end the search can only land on valid sequences; the trailing
    # literal region j ≥ body_end is overridden below)
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
        sel = (mid < T) & (mo <= j)
        lo = jnp.where(sel, mid, lo)
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

    # varint prefix
    v0 = jnp.where(vbytes == 1, decl & 0x7F, (decl & 0x7F) | 0x80)
    v1 = jnp.where(vbytes == 2, (decl >> 7) & 0x7F, ((decl >> 7) & 0x7F) | 0x80)
    v2 = (decl >> 14) & 0x7F
    val = jnp.where(j == 0, v0[:, None], val)
    val = jnp.where((j == 1) & (vbytes[:, None] > 1), v1[:, None], val)
    val = jnp.where((j == 2) & (vbytes[:, None] > 2), v2[:, None], val)
    val = jnp.where(j < comp_lens[:, None], val, 0)
    return val.astype(jnp.uint8), comp_lens
