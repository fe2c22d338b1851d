"""Zstd LZ77 sequence production — reference tier (vectorized numpy).

Role parity: reference zstd/DoubleFastBlockCompressor.java:28-180 (the level-3
match finder) + zstd/SequenceStore.java. The ALGORITHM is redesigned for
data-parallel hardware instead of the reference's pointer-chasing loop:

  1. hash a 5-byte window at EVERY position at once,
  2. candidate = nearest previous position with the same hash, found by one
     stable argsort over (hash) — adjacent entries in sort order with equal
     hash and ascending position give each position its immediate
     predecessor (no mutable hash table, no sequential dependency),
  3. match lengths for all candidates at once: 8-byte word compares extended
     round-by-round over the still-matching mask,
  4. one greedy left-to-right commit pass over accepted matches only
     (the only sequential part, O(#sequences) not O(n)).

The same 4-phase shape is what the Pallas tier implements on device; this
module is the oracle for it.

Output sequences use wire offset VALUES (real offset + 3; repcodes are
intentionally not emitted by this tier — format-valid, slightly larger).
"""

from __future__ import annotations

import numpy as np

HASH_LOG = 17
MIN_MATCH = 4
# keep a tail of literals so wild 8-byte reads stay in range
TAIL_MARGIN = 12
MAX_MATCH_CAP = 1 << 17


def _u64_windows(block: np.ndarray) -> np.ndarray:
    """w8[i] = little-endian u64 read at i, for i in [0, n-8]."""
    n = block.size
    a = block.astype(np.uint64)
    w = np.zeros(n - 7, dtype=np.uint64)
    for k in range(8):
        w |= a[k : n - 7 + k] << np.uint64(8 * k)
    return w


def find_sequences(block: np.ndarray):
    """Returns (lit_lens, offsets, match_lens, literals) arrays.

    Concatenating per sequence [literals run, match] then trailing literals
    reproduces ``block``. offsets are REAL distances (not wire values).
    """
    n = block.size
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64))
    if n < MIN_MATCH + TAIL_MARGIN + 8:
        return (*empty, block.copy())

    w8 = _u64_windows(block)
    limit = n - TAIL_MARGIN  # last position allowed to start a match
    w5 = w8[:limit] & np.uint64(0xFFFFFFFFFF)
    h = (w5 * np.uint64(0x9E3779B185EBCA87)) >> np.uint64(64 - HASH_LOG)

    order = np.argsort(h, kind="stable")
    prev = np.full(limit, -1, dtype=np.int64)
    same = h[order[1:]] == h[order[:-1]]
    prev[order[1:][same]] = order[:-1][same]

    pos = np.nonzero(prev >= 0)[0]
    cand = prev[pos]
    # verify a real 4-byte match (hash collisions)
    m4 = (w8[pos] & np.uint64(0xFFFFFFFF)) == (w8[cand] & np.uint64(0xFFFFFFFF))
    pos, cand = pos[m4], cand[m4]
    if pos.size == 0:
        return (*empty, block.copy())

    # vectorized match-length: extend by whole 8-byte words, then tail bytes
    mlen = np.zeros(pos.size, dtype=np.int64)
    active = np.ones(pos.size, dtype=bool)
    hard_cap = np.minimum(np.int64(n - 8) - pos, MAX_MATCH_CAP)
    while np.any(active):
        ai = np.nonzero(active)[0]
        p = pos[ai] + mlen[ai]
        c = cand[ai] + mlen[ai]
        x = w8[np.minimum(p, n - 8)] ^ w8[np.minimum(c, n - 8)]
        full = (x == 0) & (mlen[ai] + 8 <= hard_cap[ai])
        mlen[ai[full]] += 8
        done = ai[~full]
        if done.size:
            xd = x[~full]
            add = np.zeros(done.size, dtype=np.int64)
            still = np.ones(done.size, dtype=bool)
            for k in range(8):
                byte_eq = ((xd >> np.uint64(8 * k)) & np.uint64(0xFF)) == 0
                still = still & byte_eq
                add += still.astype(np.int64)
            mlen[done] += np.minimum(add, np.maximum(hard_cap[done] - mlen[done], 0))
            active[done] = False
    ok = mlen >= MIN_MATCH
    pos, cand, mlen = pos[ok], cand[ok], mlen[ok]
    if pos.size == 0:
        return (*empty, block.copy())

    # greedy left-to-right commit
    lit_lens, offsets, match_lens = [], [], []
    lit_chunks = []
    anchor = 0
    i = 0
    k = pos.size
    cur = 0
    while True:
        i = int(np.searchsorted(pos, cur, side="left"))
        if i >= k:
            break
        p = int(pos[i])
        ml = int(mlen[i])
        if p + ml > limit + TAIL_MARGIN - 8:
            ml = limit + TAIL_MARGIN - 8 - p
            if ml < MIN_MATCH:
                cur = p + 1
                continue
        lit_lens.append(p - anchor)
        lit_chunks.append(block[anchor:p])
        offsets.append(p - int(cand[i]))
        match_lens.append(ml)
        anchor = p + ml
        cur = anchor
    lit_chunks.append(block[anchor:])
    literals = np.concatenate(lit_chunks) if lit_chunks else block[0:0]
    return (
        np.array(lit_lens, dtype=np.int64),
        np.array(offsets, dtype=np.int64),
        np.array(match_lens, dtype=np.int64),
        literals,
    )
