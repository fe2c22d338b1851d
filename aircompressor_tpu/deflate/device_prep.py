"""Host planning for the deflate TPU decode tier.

Same division of labor as the zstd device tier (zstd/device_prep.py):
the host builds the entropy tables and the block plan; the Pallas kernel
(ops/deflate_pallas_w.py) performs the complete bit-level symbol decode
and LZ77 execution from the raw bitstream. Deflate block boundaries are
only discoverable by decoding symbols (RFC 1951: the end-of-block symbol
is Huffman coded), so the boundary scan runs in the native C++ planner
(native/src/inflate.cc) — the runtime-native layer's job, mirroring the
reference's native runtime split (deflate/DeflateNative.java:28-40).

Per-chunk plan layout (all int32):
- descriptor row: 128 lanes = 16 blocks x 8 fields
    f0 type (0 stored, 1 huffman), f1 data_bitpos, f2 litlen root base,
    f3 dist root base, f4 stored src byte offset, f5 stored length,
    f6 final flag, f7 reserved
- table page: TR*128 entries; entry 0..127 is the descriptor row itself,
  tables start at entry 128. Entry encoding (matches the kernel):
    e = (op << 28) | (nbits << 22) | val
    op 0 INVALID, 1 LITERAL, 2 LENGTH, 3 DIST, 4 EOB, 5 SUBTABLE.
"""

from __future__ import annotations

import ctypes
from typing import Sequence

import numpy as np

TAB_CAP = 96 * 128  # planner page cap (entries); chunks needing more fall back
OUT_CAP = 65536
ROOTB = 9

ST_OK, ST_FALLBACK, ST_MALFORMED = 0, 1, 2


def plan_batch(buf: np.ndarray, lens: np.ndarray):
    """Plan a (B, cap) uint8 batch of raw-deflate chunks.

    Returns (desc (B,128) i32, tabs (B, TAB_CAP) i32, info (B,4) i32)
    where info rows are [out_len, nblocks, tab_used, status].
    """
    from .. import native

    native.verify_enabled()
    B, cap = buf.shape
    buf = np.ascontiguousarray(buf)
    lens = np.ascontiguousarray(lens.astype(np.int32))
    desc = np.zeros((B, 128), np.int32)
    tabs = np.zeros((B, TAB_CAP), np.int32)
    info = np.zeros((B, 4), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    native._LIB.actpu_inflate_plan_batch(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        B, cap, lens.ctypes.data_as(i32p),
        TAB_CAP, OUT_CAP,
        desc.ctypes.data_as(i32p), tabs.ctypes.data_as(i32p),
        info.ctypes.data_as(i32p))
    return desc, tabs, info


def pack_pages(desc: np.ndarray, tabs: np.ndarray, info: np.ndarray,
               row_quantum: int = 32):
    """Pack per-chunk [desc | tables] pages at the batch's max height,
    rounded to `row_quantum` rows (bounds the kernel's jit shape cache)."""
    used = np.where(info[:, 3] == ST_OK, info[:, 2], 128)
    tr = int(max(1, -(-int(used.max()) // 128)))
    tr = -(-tr // row_quantum) * row_quantum
    pages = np.zeros((desc.shape[0], tr * 128), np.int32)
    pages[:, :128] = desc
    pages[:, 128 : tr * 128] = tabs[:, 128 : tr * 128]
    return pages, tr


def simulate_chunk(src: bytes, desc: np.ndarray, tab: np.ndarray) -> bytes:
    """Pure-Python model of the KERNEL's decode semantics (lookup
    discipline, phase machine, error rules) for differential testing —
    not a production tier."""
    out = bytearray()
    blk = 0
    while True:
        f = desc[blk * 8 : blk * 8 + 8]
        if f[0] == 0:  # stored
            off, n = int(f[4]), int(f[5])
            out += src[off : off + n]
        else:
            bitpos = int(f[1])
            llbase, dbase = int(f[2]), int(f[3])
            while True:
                e = _lookup(src, tab, llbase, bitpos)
                if e is None:
                    raise ValueError("bad symbol")
                e, bitpos = e
                op, val = e >> 28, e & 0x3FFFFF
                if op == 1:
                    out.append(val)
                elif op == 4:
                    break
                elif op == 2:
                    extra = val >> 9
                    mlen = (val & 511) + _bits(src, bitpos, extra)
                    bitpos += extra
                    de = _lookup(src, tab, dbase, bitpos)
                    if de is None:
                        raise ValueError("bad dist")
                    de, bitpos = de
                    if de >> 28 != 3:
                        raise ValueError("not a dist code")
                    dv = de & 0x3FFFFF
                    dist = (dv & 0xFFFF) + _bits(src, bitpos, dv >> 16)
                    bitpos += dv >> 16
                    if dist <= 0 or dist > len(out):
                        raise ValueError("bad distance")
                    for _ in range(mlen):
                        out.append(out[-dist])
                else:
                    raise ValueError("invalid entry")
        if f[6]:
            return bytes(out)
        blk += 1


def _bits(src: bytes, bitpos: int, k: int) -> int:
    byte = bitpos >> 3
    w = 0
    for i in range(5):
        w |= (src[byte + i] if byte + i < len(src) else 0) << (8 * i)
    return (w >> (bitpos & 7)) & ((1 << k) - 1)


def _lookup(src: bytes, tab: np.ndarray, base: int, bitpos: int):
    peek = _bits(src, bitpos, 15)
    e = int(tab[base + (peek & 511)])
    if e >> 28 == 5:
        sbits = (e >> 22) & 63
        e = int(tab[(e & 0x3FFFFF) + ((peek >> ROOTB) & ((1 << sbits) - 1))])
    nbits = (e >> 22) & 63
    if e >> 28 == 0 or nbits == 0:
        return None
    return e, bitpos + nbits


__all__ = ["plan_batch", "pack_pages", "simulate_chunk",
           "TAB_CAP", "OUT_CAP", "ST_OK", "ST_FALLBACK", "ST_MALFORMED"]
