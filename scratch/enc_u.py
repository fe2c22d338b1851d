"""Snappy encode kernel, UNIFIED-LOAD-SLOT rewrite (r5 experiment).

The production kernel (ops/snappy_encode_pallas.py) issues every phase's
dynamic loads every step (~11 in_pair calls = ~22 scalar row loads per
chunk per step) although phases are mutually exclusive per chunk. Here
each step issues exactly TWO phase-selected load pairs + ONE merged
hash-table RMW:

  slotA: drain(emit_lit)->src | SCAN->ip | EXTEND->ip+mlen |
         BEXT->ip-128 | EMITCPY(done)->mend-1
  slotB: SCAN->cand (after probe) | EXTEND->cand+mlen | BEXT->cand-128
  table: SCAN insert ip at hash(ip) | EMITCPY seed mend-1 (merged RMW)

Backward match extension moves to its own BEXT phase (one extra step per
match with nonzero backroom) so its two load pairs ride the same slots.
Output is BIT-IDENTICAL to the production kernel (same greedy decisions,
same emitted ops).
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
import os

SUB = int(os.environ.get("ENC_SUB", "8"))
ENC_G = int(os.environ.get("ENC_G", "1"))  # interleaved groups per grid step
SUBT = SUB * ENC_G  # chunks per grid step
SPLIT_W = int(os.environ.get("SPLIT_W", "6"))  # chunks per scratch/out ref
N_SPLIT = (SUBT + SPLIT_W - 1) // SPLIT_W
SPLIT_SIZES = [min(SPLIT_W, SUBT - i * SPLIT_W) for i in range(N_SPLIT)]
MAX_IN = 65536
IN_ROWS = MAX_IN // LANES  # 512
HASH_LOG = 14
TAB_ROWS = (1 << HASH_LOG) // LANES
OUT_ROWS = 600
OUT_CAP = OUT_ROWS * LANES
INPUT_MARGIN = 15

PH_SCAN, PH_EXTEND, PH_BEXT, PH_EMITCPY, PH_TAIL, PH_DONE = 0, 1, 2, 3, 4, 5


def _rep(x):
    return jnp.broadcast_to(x, (SUB, LANES))


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _encode_kernel(lens_ref, in_ref, *refs):
    out_refs = refs[:N_SPLIT]
    meta_ref = refs[N_SPLIT]
    tab_refs = refs[N_SPLIT + 1:]

    def tab(r):
        # r5 minimal-repro discipline (scratch/mosaic_scr16_repro.py):
        # too many dynamic stores to one scratch/output ref per body
        # corrupt subsequent dynamic loads at 16 sublanes
        return (tab_refs[r // SPLIT_W], r % SPLIT_W)

    def outr(r):
        return (out_refs[r // SPLIT_W], r % SPLIT_W)
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    zero = jnp.zeros((SUB, LANES), I32)
    nlen_g = [
        _rep(jnp.stack([lens_ref[g * SUBT + gi * SUB + r]
                        for r in range(SUB)]).reshape(SUB, 1))
        for gi in range(ENC_G)]

    for k, sz in enumerate(SPLIT_SIZES):
        tab_refs[k][:, :] = jnp.full((sz * TAB_ROWS, LANES), -1, I32)

    def gather2(row_a, row_b, idx):
        m = idx & 127
        return jnp.where(
            idx < 128,
            jnp.take_along_axis(row_a, m, axis=1),
            jnp.take_along_axis(row_b, m, axis=1),
        )

    def in_pair(cb, posv):
        ra, rb = [], []
        for r in range(SUB):
            h = posv[r, 0] >> 7
            h0 = jnp.clip(h, 0, IN_ROWS - 1)
            h1 = jnp.clip(h + 1, 0, IN_ROWS - 1)
            ra.append(in_ref[pl.ds((cb + r) * IN_ROWS + h0, 1), :])
            rb.append(in_ref[pl.ds((cb + r) * IN_ROWS + h1, 1), :])
        return jnp.concatenate(ra, axis=0), jnp.concatenate(rb, axis=0)

    def win(pair, posv):
        """128-lane window starting at per-chunk position posv."""
        a, b = pair
        return gather2(a, b, (posv & 127) + lane)

    def u32_at(pair, posv):
        a, b = pair
        pk = gather2(a, b, (posv & 127) + jnp.minimum(lane, 3))
        return (pk[:, 0:1] | (pk[:, 1:2] << 8) | (pk[:, 2:3] << 16)
                | (pk[:, 3:4] << 24))

    def init_of(nlen):
        vb0 = jnp.where(nlen < 128, nlen, (nlen & 127) | 128)
        rest = nlen >> 7
        vb1 = jnp.where(rest < 128, rest, (rest & 127) | 128)
        vb2 = rest >> 7
        vlen = jnp.where(nlen < 128, 1, jnp.where(rest < 128, 2, 3))
        tile0 = jnp.where(
            lane == 0, vb0,
            jnp.where((lane == 1) & (vlen >= 2), vb1,
                      jnp.where((lane == 2) & (vlen >= 3), vb2, 0)))
        phase0 = jnp.where(nlen <= 0, jnp.int32(PH_DONE),
                           jnp.int32(PH_SCAN))
        return vlen, tile0, phase0

    # carry: ip, anchor, op, phase, skip, cand, mlen, mend,
    #        rem, src, hdr0, hdr1, hdr2, hlen, err, steps, tile
    def cond(c):
        steps, states = c
        live = None
        for gi in range(ENC_G):
            phase, rem, hlen, err = (states[gi][3], states[gi][8],
                                     states[gi][13], states[gi][14])
            pending = (rem[:, 0:1] > 0) | (hlen[:, 0:1] > 0)
            lg = (err[:, 0:1] == 0) & ((phase[:, 0:1] != PH_DONE) | pending)
            live = lg if live is None else (live | lg)
        return (jnp.max(live.astype(I32)) > 0) & (steps < 6 * MAX_IN)

    def step_one(gi, c):
        cb = gi * SUB
        nlen = nlen_g[gi]
        limit = nlen - INPUT_MARGIN
        (ip, anchor, op, phase, skip, cand, mlen, mend,
         rem, src, hdr0, hdr1, hdr2, hlen, err, tile) = c
        pending = (rem > 0) | (hlen > 0)
        live = (err == 0) & ((phase != PH_DONE) | pending)
        need = live & ~pending & (phase != PH_DONE)

        in_scan = need & (phase == PH_SCAN)
        in_ext = need & (phase == PH_EXTEND)
        in_bext = need & (phase == PH_BEXT)
        in_cpy = need & (phase == PH_EMITCPY)
        in_tail = need & (phase == PH_TAIL)
        can_scan = ip < limit
        emit_lit_pre = live & pending & (hlen <= 0) & (rem > 0)

        # ---------------- EMITCPY header math (no loads; needed early for
        # cpy_done -> merged-RMW selection)
        L = mlen
        d = ip - cand
        big = L >= 68
        mid = (~big) & (L > 64)
        c1 = (~big) & (~mid) & (L <= 11) & (d < 2048)
        this_len = jnp.where(big, 64, jnp.where(mid, 60, L))
        ch0 = jnp.where(c1, 1 | ((this_len - 4) << 2) | (_srl(d, 8) << 5),
                        2 | ((this_len - 1) << 2))
        ch1 = d & 255
        ch2 = _srl(d, 8)
        chl = jnp.where(c1, 2, 3)
        cp_left = L - this_len
        cpy_done = in_cpy & (cp_left <= 0)

        # ---------------- load slot A (phase-selected position)
        posA = jnp.where(
            emit_lit_pre, src,
            jnp.where(in_scan, ip,
                      jnp.where(in_ext, ip + mlen,
                                jnp.where(in_bext, ip - 128,
                                          jnp.maximum(mend - 1, 0)))))
        pairA = in_pair(cb, posA)
        wA = win(pairA, posA)
        u32A = u32_at(pairA, posA)

        # ---------------- merged hash-table RMW
        # SCAN: probe hash(ip-bytes), insert ip. EMITCPY(done): seed
        # hash(bytes(mend-1)) = mend-1 (reference parity,
        # SnappyRawCompressor.java:205-212). Mutually exclusive phases.
        h = _srl(u32A * jnp.int32(0x1E35A7BD), 32 - HASH_LOG)
        upd = ((in_scan & can_scan) | cpy_done).astype(I32)
        ins = jnp.where(cpy_done, mend - 1, ip)
        cands = []
        for r in range(SUB):
            tr, rr = tab(cb + r)
            trow = jnp.clip(h[r, 0] >> 7, 0, TAB_ROWS - 1)
            row = tr[pl.ds(rr * TAB_ROWS + trow, 1), :]
            cands.append(row)
            hl = h[r, 0] & 127
            lv = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
            tr[pl.ds(rr * TAB_ROWS + trow, 1), :] = jnp.where(
                jnp.logical_and(lv == hl, upd[r, 0] > 0), ins[r, 0], row)
        C = jnp.concatenate(cands, axis=0)
        cand_v = jnp.take_along_axis(
            C, jnp.broadcast_to(h & 127, (SUB, LANES)), axis=1)[:, 0:1]

        # ---------------- load slot B (phase-selected position)
        posB = jnp.where(
            in_scan, jnp.maximum(cand_v, 0),
            jnp.where(in_ext, cand + mlen,
                      jnp.where(in_bext, cand - 128, zero)))
        pairB = in_pair(cb, posB)
        wB = win(pairB, posB)
        u32B = u32_at(pairB, posB)

        # ---------------- PH_SCAN resolution
        hit = can_scan & (cand_v >= 0) & (cand_v < ip) & (u32B == u32A)
        adv = _srl(skip, 5)
        sc_ip = jnp.where(hit, ip, ip + adv)
        sc_skip = jnp.where(hit, jnp.int32(32), skip + 1)
        sc_phase = jnp.where(
            can_scan, jnp.where(hit, jnp.int32(PH_EXTEND), phase),
            jnp.int32(PH_TAIL))
        sc_cand = jnp.where(hit, cand_v, cand)
        sc_mlen = jnp.where(hit, 4, mlen)

        # ---------------- PH_EXTEND (forward, 128B/step)
        cap128 = jnp.clip(nlen - (ip + mlen), 0, 128)
        neq = (wA != wB) | (lane >= cap128)
        add = jnp.min(jnp.where(neq, lane, 128), axis=1, keepdims=True)
        ex_mlen = mlen + add
        ex_done = (add < 128) | (ip + ex_mlen >= nlen)
        # backroom: can a backward extension even apply?
        backroom = jnp.minimum(ip - anchor, cand) > 0
        ext_next = jnp.where(backroom, jnp.int32(PH_BEXT),
                             jnp.int32(PH_EMITCPY))

        # ---------------- PH_BEXT (backward, one step per match)
        cap_back = jnp.clip(jnp.minimum(ip - anchor, cand), 0, 127)
        badl = (wA != wB) | (lane < 128 - cap_back)
        last_bad = jnp.max(jnp.where(badl, lane, -1), axis=1, keepdims=True)
        bx_back = 127 - last_bad
        # match grows backward, literals shrink; ip/cand stay (both ends
        # shift so the offset is unchanged — reference never emits this;
        # the format permits it)
        bx_mlen = mlen + bx_back
        litlen_b = ip - bx_back - anchor

        # literal-run scheduling: at EXTEND-done with no backroom
        # (back=0), or at BEXT
        litlen = jnp.where(in_bext, litlen_b, ip - anchor)
        in_tail_l = in_tail
        sched_point = (in_ext & ex_done & ~backroom) | in_bext
        sched_lit = (sched_point & (litlen > 0)) | (
            in_tail_l & (nlen - anchor > 0))
        use_lit = jnp.where(in_tail_l, nlen - anchor, litlen)
        n1 = use_lit - 1
        h_one = n1 < 60
        h_two = (n1 >= 60) & (n1 < 256)
        lh0 = jnp.where(h_one, n1 << 2, jnp.where(h_two, 60 << 2, 61 << 2))
        lh1 = n1 & 255
        lh2 = _srl(n1, 8)
        lhl = jnp.where(h_one, 1, jnp.where(h_two, 2, 3))

        # ---------------- scheduler state merge
        n_ip = jnp.where(in_scan, sc_ip, ip)
        n_skip = jnp.where(in_scan, sc_skip, skip)
        n_cand = jnp.where(in_scan, sc_cand, cand)
        n_mlen = jnp.where(
            in_scan, sc_mlen,
            jnp.where(in_ext, ex_mlen,
                      jnp.where(in_bext, bx_mlen,
                                jnp.where(in_cpy, cp_left, mlen))))
        # mend: fixed at forward-extension completion (bext shifts the
        # START back; the end stays)
        n_mend = jnp.where(in_ext & ex_done, ip + ex_mlen, mend)
        n_phase = jnp.where(
            in_scan, sc_phase,
            jnp.where(in_ext & ex_done, ext_next,
                      jnp.where(in_bext, jnp.int32(PH_EMITCPY),
                                jnp.where(in_tail_l, jnp.int32(PH_DONE),
                                          phase))))
        n_phase = jnp.where(cpy_done, jnp.int32(PH_SCAN), n_phase)
        n_ip = jnp.where(cpy_done, mend, n_ip)
        n_anchor = jnp.where(cpy_done, mend, anchor)
        n_anchor = jnp.where(in_tail_l, nlen, n_anchor)
        n_skip = jnp.where(cpy_done, jnp.int32(32), n_skip)

        # pending-run scheduling
        n_hdr0 = jnp.where(sched_lit, lh0, jnp.where(in_cpy, ch0, hdr0))
        n_hdr1 = jnp.where(sched_lit, lh1, jnp.where(in_cpy, ch1, hdr1))
        n_hdr2 = jnp.where(sched_lit, lh2, jnp.where(in_cpy, ch2, hdr2))
        n_hlen = jnp.where(sched_lit, lhl, jnp.where(in_cpy, chl, hlen))
        n_rem = jnp.where(sched_lit, use_lit, rem)
        n_src = jnp.where(sched_lit, anchor, src)

        # ---------------- drain engine (slotA already holds the literal
        # window when emit_lit_pre)
        o = op & 127
        emit_hdr = live & (hlen > 0)
        emit_lit = emit_lit_pre
        hrow = jnp.where(lane == 0, hdr0,
                         jnp.where(lane == 1, hdr1,
                                   jnp.where(lane == 2, hdr2, 0)))
        take_h = jnp.where(emit_hdr, jnp.minimum(hlen, 128 - o), 0)
        take_l = jnp.where(emit_lit, jnp.minimum(rem, 128 - o), 0)
        take = take_h + take_l
        idx_h = lane - o
        # slotA window starts at src; shift into output lane frame
        idx_l = lane - o
        placed = jnp.where(
            jnp.broadcast_to(emit_hdr, (SUB, LANES)),
            gather2(hrow, zero, idx_h & 255),
            jnp.take_along_axis(wA, jnp.clip(idx_l, 0, LANES - 1), axis=1))
        mask = (lane >= o) & (lane < o + take)
        n_tile = jnp.where(mask, placed, tile)
        n_op = op + take
        crossed = ((n_op & 127) == 0) & (take > 0)
        for r in range(SUB):
            orf, rr = outr(cb + r)
            orf[pl.ds(
                rr * OUT_ROWS
                + jnp.minimum(op[r, 0] >> 7, OUT_ROWS - 1),
                1), :] = n_tile[r : r + 1, :]
        n_tile = jnp.where(crossed, zero, n_tile)

        s0 = jnp.where(take_h == 1, hdr1, jnp.where(take_h == 2, hdr2, hdr0))
        s1 = jnp.where(take_h == 1, hdr2, hdr1)
        n_hdr0 = jnp.where(emit_hdr, s0, n_hdr0)
        n_hdr1 = jnp.where(emit_hdr, s1, n_hdr1)
        n_hlen = jnp.where(emit_hdr, hlen - take_h, n_hlen)
        n_rem = jnp.where(emit_lit, rem - take_l, n_rem)
        n_src = jnp.where(emit_lit, src + take_l, n_src)

        n_err = err | (live & (n_op + 8 > OUT_CAP)).astype(I32)
        return (n_ip, n_anchor, n_op, n_phase, n_skip, n_cand, n_mlen,
                n_mend, n_rem, n_src, n_hdr0, n_hdr1, n_hdr2, n_hlen,
                n_err, n_tile)

    inits = []
    for gi in range(ENC_G):
        vlen, tile0, phase0 = init_of(nlen_g[gi])
        inits.append((zero, zero, vlen, phase0, zero + 32, zero, zero,
                      zero, zero, zero, zero, zero, zero, zero, zero,
                      tile0))
    M = int(os.environ.get("ENC_M", "8"))

    def body(c):
        steps, states = c
        sts = list(states)
        for _ in range(M):
            for gi in range(ENC_G):
                sts[gi] = step_one(gi, sts[gi])
        return (steps + M, tuple(sts))

    steps, states = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tuple(inits)))

    lane2 = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    for gi in range(ENC_G):
        cb = gi * SUB
        op, err, tile = states[gi][2], states[gi][14], states[gi][15]
        for r in range(SUB):
            orf, rr = outr(cb + r)
            orf[pl.ds(
                rr * OUT_ROWS
                + jnp.minimum(op[r, 0] >> 7, OUT_ROWS - 1),
                1), :] = tile[r : r + 1, :]
        ok = err == 0
        meta_ref[pl.ds(cb, SUB), :] = jnp.where(
            lane2 == 0, op,
            jnp.where(lane2 == 1, ok.astype(I32),
                      jnp.where(lane2 == 2,
                                _rep(jnp.full((SUB, 1), steps, I32)), 0)))


@partial(jax.jit, static_argnames=("interpret",))
def _encode_impl(data, lengths, interpret: bool):
    B, L = data.shape
    rows = data.astype(I32).reshape(B * (L // LANES), LANES)
    G = B // SUBT
    outs_meta = pl.pallas_call(
        _encode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((SUBT * IN_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                [pl.BlockSpec((sz * OUT_ROWS, LANES), lambda g, *_: (g, 0),
                              memory_space=pltpu.VMEM)
                 for sz in SPLIT_SIZES]
                + [pl.BlockSpec((SUBT, LANES), lambda g, *_: (g, 0),
                                memory_space=pltpu.VMEM)]),
            scratch_shapes=[pltpu.VMEM((sz * TAB_ROWS, LANES), I32)
                            for sz in SPLIT_SIZES],
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((B // SUBT * sz * OUT_ROWS, LANES), I32)
             for sz in SPLIT_SIZES]
            + [jax.ShapeDtypeStruct((B, LANES), I32)]),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(lengths.astype(I32), rows)
    *out_parts, meta = outs_meta
    comp_lens = meta[:, 0]
    ok = meta[:, 1] > 0
    steps = meta[:, 2]
    parts = [p.reshape(B // SUBT, sz, OUT_CAP)
             for p, sz in zip(out_parts, SPLIT_SIZES)]
    out = jnp.concatenate(parts, axis=1).reshape(B, OUT_CAP)
    j = jnp.arange(OUT_CAP, dtype=I32)[None, :]
    out = jnp.where(j < comp_lens[:, None], out, 0).astype(jnp.uint8)
    return out, comp_lens, ok, steps


def encode(data, lengths, with_steps: bool = False):
    B, L = data.shape
    assert L <= MAX_IN
    if L < MAX_IN:
        data = jnp.pad(data, ((0, 0), (0, MAX_IN - L)))
    pad_b = (-B) % SUBT
    if pad_b:
        data = jnp.concatenate(
            [data, jnp.zeros((pad_b, MAX_IN), data.dtype)], axis=0)
        lengths = jnp.concatenate(
            [lengths, jnp.zeros((pad_b,), lengths.dtype)])
    interpret = jax.default_backend() != "tpu"
    out, comp_lens, ok, steps = _encode_impl(data, lengths, interpret)
    if pad_b:
        out, comp_lens, ok, steps = (
            out[:B], comp_lens[:B], ok[:B], steps[:B])
    if with_steps:
        return out, comp_lens, ok, steps
    return out, comp_lens, ok
