"""Zstd DFAST match finding — sublane-batched Pallas TPU kernel.

Reference parity: zstd/DoubleFastBlockCompressor.java:39-170 — the level-3
"dfast" strategy's structure: a LONG (8-byte-hash) and a SHORT
(5-byte-hash) table, priority repcode-at-ip+1 > long-at-ip > short-at-ip,
greedy skip acceleration, backward match extension, and the
rep0/rep1 offset history. Hash MIXES differ from the reference (32-bit
multiplicative mixes instead of 64-bit primes — the wire format does not
constrain the matcher, only the emitted sequences; SURVEY §7 design
stance). The long-at-ip+1 probe is dropped (ratio cost is small; one
fewer table access per scan step).

Output is the SoA the zstd encode path consumes (zstd/block_enc
find_sequences contract): per chunk (lit_lens, offsets, match_lens)
with REAL distances, plus the sequence count and trailing-literal count.
Sequences accumulate in three 128-lane register tiles flushed
unconditionally per iteration (write-only output rows — the same
discipline as ops/snappy_encode_pallas).

Geometry: SUB=8 chunks per grid step, ONE group — the only
device-verified-sound configuration for RMW-table kernels on current
Mosaic (DESIGN.md §8.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 128
SUB = 8
MAX_IN = 65536
IN_ROWS = MAX_IN // LANES  # 512
HASH_LOG = 14
TAB_ROWS = (1 << HASH_LOG) // LANES  # 128 rows per chunk per table
SEQ_CAP = 16384  # sequences per chunk (64KB / min-match 4)
SEQ_ROWS = SEQ_CAP // LANES  # 128 rows per field per chunk
TAIL_MARGIN = 12  # last bytes always literals (block_enc.TAIL_MARGIN)
MIN_MATCH = 4

PH_SCAN, PH_EXTEND, PH_DONE = 0, 1, 2


def _rep(x):
    return jnp.broadcast_to(x, (SUB, LANES))


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _encode_kernel(lens_ref, in_ref, ll_ref, ml_ref, of_ref, meta_ref,
                   tabL_ref, tabS_ref):
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    zero = jnp.zeros((SUB, LANES), I32)
    nlen = _rep(
        jnp.stack([lens_ref[g * SUB + r] for r in range(SUB)]).reshape(SUB, 1))

    tabL_ref[:, :] = jnp.full((SUB * TAB_ROWS, LANES), -1, I32)
    tabS_ref[:, :] = jnp.full((SUB * TAB_ROWS, LANES), -1, I32)

    def gather2(row_a, row_b, idx):
        m = idx & 127
        return jnp.where(
            idx < 128,
            jnp.take_along_axis(row_a, m, axis=1),
            jnp.take_along_axis(row_b, m, axis=1),
        )

    def in_pair(posv):
        ra, rb = [], []
        for r in range(SUB):
            h = posv[r, 0] >> 7
            h0 = jnp.clip(h, 0, IN_ROWS - 1)
            h1 = jnp.clip(h + 1, 0, IN_ROWS - 1)
            ra.append(in_ref[pl.ds(r * IN_ROWS + h0, 1), :])
            rb.append(in_ref[pl.ds(r * IN_ROWS + h1, 1), :])
        return jnp.concatenate(ra, axis=0), jnp.concatenate(rb, axis=0)

    def bytes8(posv):
        """(lo32, b4, hi3: bytes 5..7 packed) little-endian at positions."""
        Ha, Hb = in_pair(posv)
        pk = gather2(Ha, Hb, (posv & 127) + jnp.minimum(lane, 7))
        lo = (pk[:, 0:1] | (pk[:, 1:2] << 8) | (pk[:, 2:3] << 16)
              | (pk[:, 3:4] << 24))
        b4 = pk[:, 4:5]
        hi3 = pk[:, 5:6] | (pk[:, 6:7] << 8) | (pk[:, 7:8] << 16)
        return lo, b4, hi3

    def bytes4(posv):
        Ha, Hb = in_pair(posv)
        pk = gather2(Ha, Hb, (posv & 127) + jnp.minimum(lane, 3))
        return (pk[:, 0:1] | (pk[:, 1:2] << 8) | (pk[:, 2:3] << 16)
                | (pk[:, 3:4] << 24))

    def probe(tab_ref, h, pos, upd):
        """Load candidate at hash h; RMW-insert pos where upd."""
        cands = []
        trows = [jnp.clip(h[r, 0] >> 7, 0, TAB_ROWS - 1) for r in range(SUB)]
        for r in range(SUB):
            cands.append(tab_ref[pl.ds(r * TAB_ROWS + trows[r], 1), :])
        for r in range(SUB):
            hl = h[r, 0] & 127
            lv = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
            tab_ref[pl.ds(r * TAB_ROWS + trows[r], 1), :] = jnp.where(
                jnp.logical_and(lv == hl, upd[r, 0] > 0), pos[r, 0], cands[r])
        C = jnp.concatenate(cands, axis=0)
        return jnp.take_along_axis(
            C, jnp.broadcast_to(h & 127, (SUB, LANES)), axis=1)[:, 0:1]

    limit = nlen - TAIL_MARGIN
    phase0 = jnp.where(nlen < TAIL_MARGIN + MIN_MATCH + 8,
                       jnp.int32(PH_DONE), jnp.int32(PH_SCAN))

    # carry: ip, anchor, phase, skip, cand, moff, mlen, mstart, rep0, rep1,
    #        nseq, err, steps, llT, mlT, ofT
    def cond(c):
        phase, err, steps = c[2], c[11], c[12]
        live = (err[:, 0:1] == 0) & (phase[:, 0:1] != PH_DONE)
        return (jnp.max(live.astype(I32)) > 0) & (steps < 4 * MAX_IN)

    def body(c):
        (ip, anchor, phase, skip, cand, moff, mlen, mstart, rep0, rep1,
         nseq, err, steps, llT, mlT, ofT) = c
        live = (err == 0) & (phase != PH_DONE)

        # ---------------- PH_SCAN
        in_scan = live & (phase == PH_SCAN)
        can_scan = ip < limit
        lo, b4, hi3 = bytes8(ip)
        hL = _srl((lo * jnp.int32(0x1E35A7BD)) ^ (hi3 * jnp.int32(-1640531527))
                  ^ (b4 * jnp.int32(-2048144777)), 32 - HASH_LOG) & (
            (1 << HASH_LOG) - 1)
        hS = _srl((lo * jnp.int32(-1640531527)) ^ (b4 * jnp.int32(0x1E35A7BD)),
                  32 - HASH_LOG) & ((1 << HASH_LOG) - 1)
        upd = (in_scan & can_scan).astype(I32)
        candL = probe(tabL_ref, hL, ip, upd)
        candS = probe(tabS_ref, hS, ip, upd)

        # priority 1: repcode at ip+1 (reference L86-91)
        ip1 = ip + 1
        w_ip1 = bytes4(ip1)
        rep_pos = ip1 - rep0
        w_rep = bytes4(jnp.maximum(rep_pos, 0))
        hit_rep = can_scan & (rep0 > 0) & (rep_pos >= 0) & (w_rep == w_ip1)
        # priority 2: long match at ip (verify 4 bytes; EXTEND finds truth)
        wL = bytes4(jnp.maximum(candL, 0))
        hit_L = can_scan & (candL >= 0) & (candL < ip) & (wL == lo)
        # priority 3: short match at ip
        wS = bytes4(jnp.maximum(candS, 0))
        hit_S = can_scan & (candS >= 0) & (candS < ip) & (wS == lo)

        hit = hit_rep | hit_L | hit_S
        m_start = jnp.where(hit_rep, ip1, ip)
        m_cand = jnp.where(
            hit_rep, rep_pos, jnp.where(hit_L, candL, candS))
        # reference dfast cadence: step = 1 + (ip - anchor) >> 8 — far
        # gentler than snappy's skip-trigger (DoubleFastBlockCompressor
        # advances by ((ip - anchor) >> kSearchStrength) + 1)
        adv = 1 + _srl(ip - anchor, 8)
        sc_ip = jnp.where(hit, m_start, ip + adv)
        sc_skip = jnp.where(hit, jnp.int32(32), skip + 1)
        sc_phase = jnp.where(
            can_scan, jnp.where(hit, jnp.int32(PH_EXTEND), phase),
            jnp.int32(PH_DONE))
        sc_cand = jnp.where(hit, m_cand, cand)
        sc_mlen = jnp.where(hit, MIN_MATCH, mlen)
        sc_mstart = jnp.where(hit, m_start, mstart)
        sc_moff = jnp.where(hit, m_start - m_cand, moff)

        # ---------------- PH_EXTEND (up to 128 bytes/iteration)
        in_ext = live & (phase == PH_EXTEND)
        pa, pb = in_pair(mstart + mlen)
        ca, cb = in_pair(cand + mlen)
        wp = gather2(pa, pb, ((mstart + mlen) & 127) + lane)
        wq = gather2(ca, cb, ((cand + mlen) & 127) + lane)
        cap128 = jnp.clip(nlen - (mstart + mlen), 0, 128)
        neq = (wp != wq) | (lane >= cap128)
        add = jnp.min(jnp.where(neq, lane, 128), axis=1, keepdims=True)
        ex_mlen = mlen + add
        ex_done = (add < 128) | (mstart + ex_mlen >= nlen)
        # backward extension into pending literals (reference L133-139)
        bpa, bpb = in_pair(mstart - 128)
        bca, bcb = in_pair(cand - 128)
        wpb = gather2(bpa, bpb, ((mstart - 128) & 127) + lane)
        wqb = gather2(bca, bcb, ((cand - 128) & 127) + lane)
        cap_back = jnp.clip(jnp.minimum(mstart - anchor, cand), 0, 127)
        badl = (wpb != wqb) | (lane < 128 - cap_back)
        last_bad = jnp.max(jnp.where(badl, lane, -1), axis=1, keepdims=True)
        back = jnp.where(in_ext & ex_done, 127 - last_bad, 0)

        fin = in_ext & ex_done
        f_start = mstart - back
        f_len = ex_mlen + back
        f_ll = f_start - anchor
        # ---- emit the sequence into the register tiles
        s_lane = nseq & 127
        setm = jnp.broadcast_to(fin, (SUB, LANES)) & (lane == s_lane)
        llT = jnp.where(setm, f_ll, llT)
        mlT = jnp.where(setm, f_len, mlT)
        ofT = jnp.where(setm, moff, ofT)
        n_nseq = jnp.where(fin, nseq + 1, nseq)
        err = err | (fin & (n_nseq > SEQ_CAP)).astype(I32)
        # rep history: new real offset shifts, rep-hit keeps (moff==rep0)
        is_new = fin & (moff != rep0)
        n_rep1 = jnp.where(is_new, rep0, rep1)
        n_rep0 = jnp.where(is_new, moff, rep0)
        # unconditional tile flush (write-only rows): on a crossing
        # iteration lane 127 was just set, so the OLD row index holds the
        # completed row's content
        for r in range(SUB):
            rowp = jnp.minimum(nseq[r, 0] >> 7, SEQ_ROWS - 1)
            ll_ref[pl.ds(r * SEQ_ROWS + rowp, 1), :] = llT[r : r + 1, :]
            ml_ref[pl.ds(r * SEQ_ROWS + rowp, 1), :] = mlT[r : r + 1, :]
            of_ref[pl.ds(r * SEQ_ROWS + rowp, 1), :] = ofT[r : r + 1, :]
        crossed = jnp.broadcast_to(
            fin & ((n_nseq & 127) == 0), (SUB, LANES))
        llT = jnp.where(crossed, zero, llT)
        mlT = jnp.where(crossed, zero, mlT)
        ofT = jnp.where(crossed, zero, ofT)

        # ---------------- state merge
        n_ip = jnp.where(in_scan, sc_ip, jnp.where(fin, f_start + f_len, ip))
        n_anchor = jnp.where(fin, f_start + f_len, anchor)
        n_phase = jnp.where(
            in_scan, sc_phase, jnp.where(fin, jnp.int32(PH_SCAN), phase))
        n_skip = jnp.where(in_scan, sc_skip,
                           jnp.where(fin, jnp.int32(32), skip))
        n_cand = jnp.where(in_scan, sc_cand, cand)
        n_moff = jnp.where(in_scan, sc_moff, moff)
        n_mlen = jnp.where(in_scan, sc_mlen,
                           jnp.where(in_ext, ex_mlen, mlen))
        n_mstart = jnp.where(in_scan, sc_mstart, mstart)
        # malformed guard (cannot trigger on well-formed state)
        err = err | (fin & ((f_ll < 0) | (moff <= 0)
                            | (moff > f_start))).astype(I32)
        return (n_ip, n_anchor, n_phase, n_skip, n_cand, n_moff, n_mlen,
                n_mstart, n_rep0, n_rep1, n_nseq, err, steps + 1, llT,
                mlT, ofT)

    init = (zero, zero, phase0, zero + 32, zero, zero, zero, zero,
            zero + 1, zero + 4, zero, zero, jnp.int32(0), zero, zero, zero)
    out = jax.lax.while_loop(cond, body, init)
    anchor, nseq, err, steps = out[1], out[10], out[11], out[12]
    llT, mlT, ofT = out[13], out[14], out[15]

    # final tile flush (partial last row)
    for r in range(SUB):
        row = jnp.minimum(nseq[r, 0] >> 7, SEQ_ROWS - 1)
        ll_ref[pl.ds(r * SEQ_ROWS + row, 1), :] = llT[r : r + 1, :]
        ml_ref[pl.ds(r * SEQ_ROWS + row, 1), :] = mlT[r : r + 1, :]
        of_ref[pl.ds(r * SEQ_ROWS + row, 1), :] = ofT[r : r + 1, :]

    last_lit = nlen - anchor
    ok = err == 0
    meta_ref[:, :] = jnp.where(
        lane == 0, nseq,
        jnp.where(lane == 1, last_lit,
                  jnp.where(lane == 2, ok.astype(I32),
                            jnp.where(lane == 3,
                                      _rep(jnp.full((SUB, 1), steps, I32)),
                                      0))))


@partial(jax.jit, static_argnames=("interpret",))
def _find_impl(data, lengths, interpret: bool):
    B, L = data.shape
    rows = data.astype(I32).reshape(B * (L // LANES), LANES)
    G = B // SUB
    ll, ml, of, meta = pl.pallas_call(
        _encode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((SUB * IN_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SUB * SEQ_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB * SEQ_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB * SEQ_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((SUB * TAB_ROWS, LANES), I32),
                pltpu.VMEM((SUB * TAB_ROWS, LANES), I32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * SEQ_ROWS, LANES), I32),
            jax.ShapeDtypeStruct((B * SEQ_ROWS, LANES), I32),
            jax.ShapeDtypeStruct((B * SEQ_ROWS, LANES), I32),
            jax.ShapeDtypeStruct((B, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(lengths.astype(I32), rows)
    return (ll.reshape(B, SEQ_CAP), ml.reshape(B, SEQ_CAP),
            of.reshape(B, SEQ_CAP), meta[:, 0], meta[:, 1], meta[:, 2] > 0)


def find_sequences_batch(data, lengths):
    """DFAST match finding for B chunks (≤64KB) in ONE kernel launch.

    data (B, L≤65536) uint8 zero-padded, lengths (B,) int32. Returns
    (ll (B, SEQ_CAP), ml, of i32 arrays, nseq (B,), last_lit (B,),
    ok (B,)) — real distances, block_enc.find_sequences semantics."""
    B, L = data.shape
    assert L <= MAX_IN
    if L < MAX_IN:
        data = jnp.pad(data, ((0, 0), (0, MAX_IN - L)))
    pad_b = (-B) % SUB
    if pad_b:
        data = jnp.concatenate(
            [data, jnp.zeros((pad_b, MAX_IN), data.dtype)], axis=0)
        lengths = jnp.concatenate(
            [lengths, jnp.zeros((pad_b,), lengths.dtype)])
    interpret = jax.default_backend() != "tpu"
    ll, ml, of, nseq, last_lit, ok = _find_impl(data, lengths, interpret)
    if pad_b:
        ll, ml, of = ll[:B], ml[:B], of[:B]
        nseq, last_lit, ok = nseq[:B], last_lit[:B], ok[:B]
    return ll, ml, of, nseq, last_lit, ok
