"""LZ4 block codec — reference tier (scalar control flow + numpy bulk ops).

Own design from the public LZ4 block format. Parity target: reference
lz4/Lz4RawCompressor.java (greedy hash-table match finder with skip-trigger
acceleration) and lz4/Lz4RawDecompressor.java (strict bounds checks). The
compressed output is format-valid and sized at-or-below the reference's
(we use a 32K-entry hash table vs the reference's 4K).
"""

from __future__ import annotations

import numpy as np

from ..errors import MalformedInputException
from . import constants as C


def _hash_all(src: np.ndarray) -> np.ndarray:
    """Multiplicative hash of the 5 bytes at every position (vectorized).

    5 bytes of context (like 64-bit LZ4 and the reference's 8-byte hash,
    Lz4RawCompressor.java:50-62) measurably beats a 4-byte hash on ratio."""
    n = src.size
    if n < 8:
        return np.zeros(0, dtype=np.int64)
    v = np.zeros(n - 7, dtype=np.uint64)
    for k in range(5):
        v |= src[k : n - 7 + k].astype(np.uint64) << np.uint64(8 * k)
    h = ((v << np.uint64(24)) * np.uint64(0x9E3779B185EBCA87)) >> np.uint64(64 - C.HASH_LOG)
    return h.astype(np.int64)


def _match_forward(src: np.ndarray, a: int, b: int, limit: int) -> int:
    """Length of the common run src[a:] == src[b:], b < limit."""
    span = limit - b
    if span <= 0:
        return 0
    x = src[a : a + span]
    y = src[b : b + span]
    neq = x != y
    idx = int(np.argmax(neq))
    if not neq[idx]:
        return span
    return idx


def compress(src: np.ndarray, dst: np.ndarray, acceleration: int = 1) -> int:
    """Compress ``src`` (uint8) into ``dst``; returns bytes written."""
    n = int(src.size)
    if n > C.MAX_INPUT_SIZE:
        raise ValueError("input too large for LZ4")
    out = dst
    op = 0

    def emit_sequence(anchor: int, pos: int, match_len_minus4: int, offset: int) -> int:
        nonlocal op
        lit_len = pos - anchor
        token_pos = op
        op += 1
        if lit_len >= C.RUN_MASK:
            token_lit = C.RUN_MASK
            rest = lit_len - C.RUN_MASK
            while rest >= 255:
                out[op] = 255
                op += 1
                rest -= 255
            out[op] = rest
            op += 1
        else:
            token_lit = lit_len
        if lit_len:
            out[op : op + lit_len] = src[anchor:pos]
            op += lit_len
        if offset >= 0:
            out[op] = offset & 0xFF
            out[op + 1] = (offset >> 8) & 0xFF
            op += 2
            if match_len_minus4 >= C.ML_MASK:
                token_ml = C.ML_MASK
                rest = match_len_minus4 - C.ML_MASK
                while rest >= 255:
                    out[op] = 255
                    op += 1
                    rest -= 255
                out[op] = rest
                op += 1
            else:
                token_ml = match_len_minus4
            out[token_pos] = (token_lit << 4) | token_ml
        else:
            out[token_pos] = token_lit << 4
        return op

    if n < C.MF_LIMIT + 1:
        emit_sequence(0, n, 0, -1)
        return op

    hashes = _hash_all(src)
    table = np.full(1 << C.HASH_LOG, -1, dtype=np.int64)
    match_limit = n - C.LAST_LITERALS
    mf_limit = n - C.MF_LIMIT
    anchor = 0
    pos = 0
    acceleration = max(int(acceleration), 1)

    while True:
        # --- find a match (greedy, skip-accelerated like the reference,
        # Lz4RawCompressor.java:115-138) ---
        p = pos
        step_counter = acceleration << C.SKIP_TRIGGER
        found = -1
        while True:
            if p > mf_limit:
                emit_sequence(anchor, n, 0, -1)
                return op
            h = int(hashes[p])
            cand = int(table[h])
            table[h] = p
            if cand >= 0 and p - cand <= C.MAX_DISTANCE and (
                src[cand] == src[p]
                and src[cand + 1] == src[p + 1]
                and src[cand + 2] == src[p + 2]
                and src[cand + 3] == src[p + 3]
            ):
                found = cand
                break
            step = step_counter >> C.SKIP_TRIGGER
            step_counter += 1
            p += step
        pos = p
        match = found
        # backward extension ("catch up", reference Lz4RawCompressor.java:141-144)
        while pos > anchor and match > 0 and src[pos - 1] == src[match - 1]:
            pos -= 1
            match -= 1
        # forward extension
        mlen = C.MIN_MATCH + _match_forward(src, match + C.MIN_MATCH, pos + C.MIN_MATCH, match_limit)
        emit_sequence(anchor, pos, mlen - C.MIN_MATCH, pos - match)
        pos += mlen
        anchor = pos
        if pos > mf_limit:
            emit_sequence(anchor, n, 0, -1)
            return op
        # index every position covered by the match (vectorized scatter with
        # last-wins semantics == sequential insertion order); improves ratio
        # beyond the reference's single pos-2 insertion
        lo = max(match + 1, pos - mlen)
        if pos - lo > 1:
            idx = np.arange(lo, pos)
            table[hashes[idx]] = idx


def decompress(src: np.ndarray, dst: np.ndarray) -> int:
    """Decompress an LZ4 block; returns bytes written.

    Raises MalformedInputException with the input offset of the problem
    (parity: reference lz4/Lz4RawDecompressor.java:35-198)."""
    n = int(src.size)
    out_cap = int(dst.size)
    if n == 0:
        raise MalformedInputException(0, "input is empty")
    ip = 0
    op = 0
    while True:
        if ip >= n:
            raise MalformedInputException(ip, "unexpected end of input")
        token = int(src[ip])
        ip += 1
        lit_len = token >> 4
        if lit_len == C.RUN_MASK:
            while True:
                if ip >= n:
                    raise MalformedInputException(ip, "unexpected end of input in literal length")
                b = int(src[ip])
                ip += 1
                lit_len += b
                if b != 255:
                    break
        if ip + lit_len > n:
            raise MalformedInputException(ip, "literal length exceeds input")
        if op + lit_len > out_cap:
            raise MalformedInputException(ip, "output buffer too small")
        if lit_len:
            dst[op : op + lit_len] = src[ip : ip + lit_len]
            ip += lit_len
            op += lit_len
        if ip == n:
            # final sequence: literals only
            return op
        if ip + 2 > n:
            raise MalformedInputException(ip, "truncated match offset")
        offset = int(src[ip]) | (int(src[ip + 1]) << 8)
        ip += 2
        if offset == 0 or offset > op:
            raise MalformedInputException(ip, "offset outside buffer")
        match_len = token & C.ML_MASK
        if match_len == C.ML_MASK:
            while True:
                if ip >= n:
                    raise MalformedInputException(ip, "unexpected end of input in match length")
                b = int(src[ip])
                ip += 1
                match_len += b
                if b != 255:
                    break
        match_len += C.MIN_MATCH
        if op + match_len > out_cap:
            raise MalformedInputException(ip, "output buffer too small")
        start = op - offset
        if offset >= match_len:
            dst[op : op + match_len] = dst[start : start + match_len]
        else:
            # overlapping copy: modular gather (replaces the reference's
            # DEC_32/DEC_64 increment-table trick, Lz4RawDecompressor.java:146-161)
            idx = start + (np.arange(match_len) % offset)
            dst[op : op + match_len] = dst[idx]
        op += match_len
