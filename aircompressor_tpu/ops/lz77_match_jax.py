"""Shared chunk-parallel LZ77 greedy matcher — JAX/TPU tier.

The match-finding pipeline used by the Snappy and LZ4 encode kernels
(SURVEY.md §7 "vectorized hash-table kernel"; role parity with the
reference's sequential hash-table loops, snappy/SnappyRawCompressor.java:74-233
and lz4/Lz4RawCompressor.java:69-192):

  1. hash a 4-byte window at every position;
  2. candidate = nearest previous same-hash position via one stable per-row
     argsort (parallel last-write-wins probing);
  3. match lengths by 4-byte compare gather rounds, capped at ``max_match``;
  4. greedy non-overlapping commit as a jump-chain walk: suffix-minimum of
     match positions → g(x) = nextm(x) + len(nextm(x)) → 64 sequences per
     ``lax.scan`` step through pre-composed jump tables, expanded back with
     a gather tree. The anchors double as previous-sequence ends, giving
     literal runs with plain arithmetic (no scans, no scatters).

Returns per-sequence arrays (B, T): seq_valid, match position, length,
distance, literal run, literal source start, plus last_end/trail per row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32 = jnp.int32
HASH_BITS = 14
MIN_MATCH = 4
MARGIN = 12


def _shift(a, k):
    if k == 0:
        return a
    B, L = a.shape
    pad = jnp.zeros((B, k), dtype=a.dtype)
    return jnp.concatenate([a[:, k:], pad], axis=1)


def _row_gather(a, idx):
    return jnp.take_along_axis(a, idx, axis=1, mode="clip")


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


def greedy_matches(d, lengths, max_match: int):
    """d: (B, L) int32 byte values; lengths: (B,) int32.

    Returns dict with (B, T) sequence arrays and (B,) trail info."""
    B, L = d.shape
    pos = jnp.arange(L, dtype=I32)[None, :]
    end = lengths[:, None]

    b1, b2, b3 = _shift(d, 1), _shift(d, 2), _shift(d, 3)
    w4 = (d | (b1 << 8) | (b2 << 16) | (b3 << 24)).astype(jnp.uint32)
    h = ((w4 * jnp.uint32(0x1E35A7BD)) >> jnp.uint32(32 - HASH_BITS)).astype(I32)

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
    inv = jnp.argsort(perm, axis=1).astype(I32)
    cand = _row_gather(jnp.where(same_h, prev_perm, -1), inv)
    cand_ok = (cand >= 0) & (_row_gather(w4, jnp.maximum(cand, 0)) == w4) & can_start

    mlen = jnp.where(cand_ok, MIN_MATCH, 0)
    grow = cand_ok
    for _ in range(max_match // 4 - 1):
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
    mlen = jnp.where(valid, jnp.minimum(mlen, max_match), 0)
    dist = jnp.where(valid, pos - cand, 1)

    BIG = I32(L)
    mpos = jnp.where(valid, pos, BIG)
    nextm = _suffix_min(mpos)
    nm = jnp.minimum(nextm, L - 1)
    g = jnp.where(nextm < BIG, jnp.minimum(nm + _row_gather(mlen, nm), L - 1), L - 1)
    tables = [g]
    for _ in range(5):
        t = tables[-1]
        tables.append(_row_gather(t, t))
    J64 = _row_gather(tables[-1], tables[-1])
    T2 = L // 4 + 2
    S = (T2 + 63) // 64

    def step(p, _):
        return _row_gather(J64, p[:, None])[:, 0], p

    # derive the init from the inputs so the carry inherits sharding/varying
    # status under shard_map (the *0 fuses away)
    _, anchors = jax.lax.scan(step, lengths * 0, None, length=S)
    toks = anchors
    for tbl in reversed(tables):
        mid = jnp.take_along_axis(tbl, toks.T, axis=1).T
        toks = jnp.stack([toks, mid], axis=1).reshape(-1, toks.shape[1])
    anchors_bt = toks.T  # (B, T)

    sp = _row_gather(nextm, jnp.minimum(anchors_bt, L - 1))
    seq_valid = (sp < BIG) & (anchors_bt < end)
    sp_c = jnp.minimum(sp, L - 1)
    s_len = jnp.where(seq_valid, _row_gather(mlen, sp_c), 0)
    s_dist = _row_gather(dist, sp_c)
    s_end = jnp.where(seq_valid, sp + s_len, -1)
    run = jnp.maximum(jnp.where(seq_valid, sp - jnp.maximum(anchors_bt, 0), 0), 0)
    s_lit_src = jnp.where(seq_valid, sp - run, 0)

    last_end = jnp.maximum(jnp.max(jnp.where(seq_valid, s_end, 0), axis=1), 0)
    trail = jnp.maximum(lengths - last_end, 0)
    return {
        "seq_valid": seq_valid,
        "len": s_len,
        "dist": s_dist,
        "run": run,
        "lit_src": s_lit_src,
        "last_end": last_end,
        "trail": trail,
    }
