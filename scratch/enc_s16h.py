"""Snappy block ENCODE — sublane-batched Pallas TPU megakernel (SUB-way).

Format parity: reference snappy/SnappyRawCompressor.java:69-345 (greedy
single-hash matcher with skip acceleration, 4-byte minimum match, literal
tags with 1-2 extra length bytes, emitCopy 64-byte chunking, varint
uncompressed-length prefix).

Same vectorized SUB-chunks-per-grid-step architecture as the decode
megakernels (ops/snappy_pallas8.py), plus the one thing encode needs that
decode does not: a MUTABLE per-chunk hash table. It lives in a VMEM
scratch block — reads are dynamic-row loads + one split-gather across all
SUB chunks; writes are read-modify-write row stores (both hide under the
loop floor; see DESIGN.md).

Control structure mirrors the decode kernels: a pending RUN (header bytes
from registers, then literal bytes from the input) drains through the
128-byte window engine; the SCHEDULER phases only fire when nothing is
pending:

  0 SCAN     hash/probe/update at ip; verified 4-byte match -> EXTEND;
             otherwise ip += 1 + (skip++ >> 5) (reference acceleration)
  1 EXTEND   lengthen the match up to 128 bytes/iteration (two
             split-gather windows + first-mismatch lane reduction); on
             completion schedules the pending literal run's header+bytes
  2 EMITCPY  schedules ONE copy op header (2-3 bytes) per iteration with
             the reference's 64-byte chunking until the match is spent,
             then returns to SCAN at the match end
  3 TAIL     schedules the final literal run
  4 DONE     terminal

The varint length prefix is placed at init. Output is capped at
max_compressed_length; overflow sets the per-chunk error flag (callers
fall back to a host tier — compress never overruns its bound)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 128
SUB = 16
ENC_G = 1
SUBT = SUB * ENC_G  # chunks per grid step
MAX_IN = 65536  # chunk cap (the snappy framing chunk size)
IN_ROWS = MAX_IN // LANES  # 512
HASH_LOG = 14
TAB_ROWS = (1 << HASH_LOG) // LANES  # 128 rows per chunk
# worst case 64KB: 3 + 65536 + 65536/6 + slack -> 600 rows (76800)
OUT_ROWS = 600
OUT_CAP = OUT_ROWS * LANES
INPUT_MARGIN = 15  # reference: the last 15 bytes are always literals

PH_SCAN, PH_EXTEND, PH_EMITCPY, PH_TAIL, PH_DONE = 0, 1, 2, 3, 4


def _rep(x):
    return jnp.broadcast_to(x, (SUB, LANES))


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _encode_kernel(lens_ref, in_ref, out_ref, meta_ref, *tab_refs):
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    zero = jnp.zeros((SUB, LANES), I32)

    # per-grid-step hash-table reset (one full-block store per group; each
    # group owns a DEDICATED scratch ref — a shared ref's interleaved
    # RMW streams miscompile on current Mosaic, r4 bisect)
    for gi in range(ENC_G):
        tab_refs[gi][:, :] = jnp.full((SUB * TAB_ROWS, LANES), -1, I32)

    def gather2(row_a, row_b, idx):
        m = idx & 127
        return jnp.where(
            idx < 128,
            jnp.take_along_axis(row_a, m, axis=1),
            jnp.take_along_axis(row_b, m, axis=1),
        )

    def in_pair(gi, posv):
        """(SUB,128) input row pair at per-chunk byte positions."""
        ra, rb = [], []
        for r in range(SUB):
            c = gi * SUB + r
            h = posv[r, 0] >> 7
            h0 = jnp.clip(h, 0, IN_ROWS - 1)
            h1 = jnp.clip(h + 1, 0, IN_ROWS - 1)
            ra.append(in_ref[pl.ds(c * IN_ROWS + h0, 1), :])
            rb.append(in_ref[pl.ds(c * IN_ROWS + h1, 1), :])
        return jnp.concatenate(ra, axis=0), jnp.concatenate(rb, axis=0)

    def bytes4(gi, posv):
        """Little-endian u32 at per-chunk positions (zero-padded rows)."""
        Ha, Hb = in_pair(gi, posv)
        pk = gather2(Ha, Hb, (posv & 127) + jnp.minimum(lane, 3))
        return (pk[:, 0:1] | (pk[:, 1:2] << 8) | (pk[:, 2:3] << 16)
                | (pk[:, 3:4] << 24))

    # ---- per-group constants + varint uncompressed-length prefix (1-3
    # bytes for <=64KB) at init
    nlen_g, op0_g, tile0_g, phase0_g, limit_g = [], [], [], [], []
    for gi in range(ENC_G):
        nlen = _rep(jnp.stack(
            [lens_ref[g * SUBT + gi * SUB + r] for r in range(SUB)]
        ).reshape(SUB, 1))
        vb0 = jnp.where(nlen < 128, nlen, (nlen & 127) | 128)
        rest = nlen >> 7
        vb1 = jnp.where(rest < 128, rest, (rest & 127) | 128)
        vb2 = rest >> 7
        vlen = jnp.where(nlen < 128, 1, jnp.where(rest < 128, 2, 3))
        tile0 = jnp.where(
            lane == 0, vb0,
            jnp.where((lane == 1) & (vlen >= 2), vb1,
                      jnp.where((lane == 2) & (vlen >= 3), vb2, 0)))
        nlen_g.append(nlen)
        op0_g.append(vlen)
        tile0_g.append(tile0)
        phase0_g.append(
            jnp.where(nlen <= 0, jnp.int32(PH_DONE), jnp.int32(PH_SCAN)))
        limit_g.append(nlen - INPUT_MARGIN)  # last match-START position

    # per-group carry: ip, anchor, op, phase, skip, cand, mlen, mend,
    #                  rem, src, hdr0, hdr1, hdr2, hlen, err, tile, prev
    def cond(c):
        steps = c[0]
        live = None
        for gi in range(ENC_G):
            phase, rem, hlen, err = (c[1][gi][3], c[1][gi][8],
                                     c[1][gi][13], c[1][gi][14])
            pending = (rem > 0) | (hlen > 0)
            lg = (err == 0) & ((phase != PH_DONE) | pending)
            live = lg if live is None else (live | lg)
        return (jnp.max(live.astype(I32)) > 0) & (steps < 6 * MAX_IN)

    def step_g(gi, c):
        (ip, anchor, op, phase, skip, cand, mlen, mend,
         rem, src, hdr0, hdr1, hdr2, hlen, err, tile, prev) = c
        nlen, limit = nlen_g[gi], limit_g[gi]
        pending = (rem > 0) | (hlen > 0)
        live = (err == 0) & ((phase != PH_DONE) | pending)
        need = live & ~pending & (phase != PH_DONE)

        # ---------------- PH_SCAN
        in_scan = need & (phase == PH_SCAN)
        can_scan = ip < limit
        w = bytes4(gi, ip)
        h = _srl(w * jnp.int32(0x1E35A7BD), 32 - HASH_LOG)
        upd = (in_scan & can_scan).astype(I32)
        # all probe loads BEFORE all write-backs (unconditional RMW: a
        # per-chunk pl.when branch costs ~43ns; writing `row` back
        # unchanged when not updating is free)
        tab_ref = tab_refs[gi]
        cands = []
        trows = [jnp.clip(h[r, 0] >> 7, 0, TAB_ROWS - 1) for r in range(SUB)]
        for r in range(SUB):
            cands.append(tab_ref[pl.ds(r * TAB_ROWS + trows[r], 1), :])
        for r in range(SUB):
            hl = h[r, 0] & 127
            lv = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
            tab_ref[pl.ds(r * TAB_ROWS + trows[r], 1), :] = jnp.where(
                jnp.logical_and(lv == hl, upd[r, 0] > 0), ip[r, 0], cands[r])

        C = jnp.concatenate(cands, axis=0)
        cand_v = jnp.take_along_axis(C, jnp.broadcast_to(h & 127, (SUB, LANES)),
                                     axis=1)[:, 0:1]
        wc = bytes4(gi, jnp.maximum(cand_v, 0))
        hit = can_scan & (cand_v >= 0) & (cand_v < ip) & (wc == w)
        # reference cadence: advance by skip>>5, skip++ per probe
        # (SnappyRawCompressor.java:141)
        adv = _srl(skip, 5)
        sc_ip = jnp.where(hit, ip, ip + adv)
        sc_skip = jnp.where(hit, jnp.int32(32), skip + 1)
        sc_phase = jnp.where(
            can_scan, jnp.where(hit, jnp.int32(PH_EXTEND), phase),
            jnp.int32(PH_TAIL))
        sc_cand = jnp.where(hit, cand_v, cand)
        sc_mlen = jnp.where(hit, 4, mlen)

        # ---------------- PH_EXTEND (up to 128 bytes per iteration)
        in_ext = need & (phase == PH_EXTEND)
        pa, pb = in_pair(gi, ip + mlen)
        ca, cb = in_pair(gi, cand + mlen)
        wp = gather2(pa, pb, ((ip + mlen) & 127) + lane)
        wq = gather2(ca, cb, ((cand + mlen) & 127) + lane)
        cap128 = jnp.clip(nlen - (ip + mlen), 0, 128)
        neq = (wp != wq) | (lane >= cap128)
        add = jnp.min(jnp.where(neq, lane, 128), axis=1, keepdims=True)
        ex_mlen = mlen + add
        ex_done = (add < 128) | (ip + ex_mlen >= nlen)
        # backward extension: grow the match into the pending literals while
        # the preceding bytes also match (the format permits it even though
        # the reference's snappy encoder never emits it; same trick as
        # lz4_encode_pallas — both ends shift so the offset is unchanged)
        bpa, bpb = in_pair(gi, ip - 128)
        bca, bcb = in_pair(gi, cand - 128)
        wpb = gather2(bpa, bpb, ((ip - 128) & 127) + lane)
        wqb = gather2(bca, bcb, ((cand - 128) & 127) + lane)
        cap_back = jnp.clip(jnp.minimum(ip - anchor, cand), 0, 127)
        badl = (wpb != wqb) | (lane < 128 - cap_back)
        last_bad = jnp.max(jnp.where(badl, lane, -1), axis=1, keepdims=True)
        back = jnp.where(in_ext & ex_done, 127 - last_bad, 0)
        litlen = ip - back - anchor

        # ---------------- PH_TAIL
        in_tail = need & (phase == PH_TAIL)
        tl_litlen = nlen - anchor

        # literal header bytes (EXTEND completion or TAIL)
        sched_lit = (in_ext & ex_done & (litlen > 0)) | (
            in_tail & (tl_litlen > 0))
        use_lit = jnp.where(in_tail, tl_litlen, litlen)
        n1 = use_lit - 1
        h_one = n1 < 60
        h_two = (n1 >= 60) & (n1 < 256)
        lh0 = jnp.where(h_one, n1 << 2, jnp.where(h_two, 60 << 2, 61 << 2))
        lh1 = n1 & 255
        lh2 = _srl(n1, 8)
        lhl = jnp.where(h_one, 1, jnp.where(h_two, 2, 3))

        # ---------------- PH_EMITCPY: one copy op per visit
        in_cpy = need & (phase == PH_EMITCPY)
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

        # ---------------- scheduler state merge
        n_ip = jnp.where(in_scan, sc_ip, ip)
        n_skip = jnp.where(in_scan, sc_skip, skip)
        n_cand = jnp.where(in_scan, sc_cand, cand)
        n_mlen = jnp.where(in_scan, sc_mlen,
                           jnp.where(in_ext, ex_mlen + back,
                                     jnp.where(in_cpy, cp_left, mlen)))
        n_mend = jnp.where(in_ext & ex_done, ip + ex_mlen, mend)
        n_phase = jnp.where(
            in_scan, sc_phase,
            jnp.where(in_ext & ex_done, jnp.int32(PH_EMITCPY),
                      jnp.where(in_tail, jnp.int32(PH_DONE), phase)))
        # after the whole match is scheduled, scanning resumes at its end
        cpy_done = in_cpy & (cp_left <= 0)
        n_phase = jnp.where(cpy_done, jnp.int32(PH_SCAN), n_phase)
        n_ip = jnp.where(cpy_done, mend, n_ip)
        n_anchor = jnp.where(cpy_done, mend, anchor)
        n_anchor = jnp.where(in_tail, nlen, n_anchor)
        n_skip = jnp.where(cpy_done, jnp.int32(32), n_skip)

        # pending-run scheduling (header registers + literal run)
        n_hdr0 = jnp.where(sched_lit, lh0, jnp.where(in_cpy, ch0, hdr0))
        n_hdr1 = jnp.where(sched_lit, lh1, jnp.where(in_cpy, ch1, hdr1))
        n_hdr2 = jnp.where(sched_lit, lh2, jnp.where(in_cpy, ch2, hdr2))
        n_hlen = jnp.where(sched_lit, lhl, jnp.where(in_cpy, chl, hlen))
        n_rem = jnp.where(sched_lit, use_lit, rem)
        n_src = jnp.where(sched_lit, anchor, src)

        # ---------------- drain engine: header bytes then literal window
        # (SUB=16 experiment: 16-wide COLUMN math is sound on device, but
        # 16-row WIDE ops corrupt — run the wide drain per 8-row half)
        o = op & 127
        emit_hdr = live & (hlen > 0)
        emit_lit = live & (hlen <= 0) & (rem > 0)
        take_h = jnp.where(emit_hdr, jnp.minimum(hlen, 128 - o), 0)
        take_l = jnp.where(emit_lit, jnp.minimum(rem, 128 - o), 0)
        take = take_h + take_l
        La, Lb = in_pair(gi, src)
        lane8 = jax.lax.broadcasted_iota(I32, (8, LANES), 1)
        zero8 = jnp.zeros((8, LANES), I32)
        tiles = []
        for hh in range(SUB // 8):
            sl = slice(hh * 8, hh * 8 + 8)
            o_h = o[sl]
            hrow_h = jnp.where(lane8 == 0, hdr0[sl],
                               jnp.where(lane8 == 1, hdr1[sl],
                                         jnp.where(lane8 == 2, hdr2[sl], 0)))
            idx_h = lane8 - o_h
            idx_l = (src[sl] & 127) + lane8 - o_h
            placed = jnp.where(
                jnp.broadcast_to(emit_hdr[sl], (8, LANES)),
                gather2(hrow_h, zero8, idx_h & 255),
                gather2(La[sl], Lb[sl], idx_l & 255))
            mask = (lane8 >= o_h) & (lane8 < o_h + take[sl])
            tiles.append(jnp.where(mask, placed, tile[sl]))
        n_tile = jnp.concatenate(tiles, axis=0)
        n_op = op + take
        crossed = ((n_op & 127) == 0) & (take > 0)
        # unconditional per-chunk store of the in-progress tile: on a
        # crossing iteration this is the row's final value; otherwise a
        # partial write nothing reads (output is write-only). Row clipped:
        # an errored chunk can park op at OUT_CAP (its output is invalid).
        for hh in range(SUB // 8):
            for r in range(8):
                rr = hh * 8 + r
                c2 = gi * SUB + rr
                out_ref[pl.ds(
                    c2 * OUT_ROWS + jnp.minimum(op[rr, 0] >> 7, OUT_ROWS - 1),
                    1), :] = tiles[hh][r : r + 1, :]
        n_prev = jnp.where(crossed, n_tile, prev)
        n_tile = jnp.where(crossed, zero, n_tile)

        # header byte shift after a partial/total header drain
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
                n_err, n_tile, n_prev)

    def body(c):
        steps, states = c
        # interleave: one step per group — the ENC_G chains are
        # data-independent so the scheduler overlaps them
        return (steps + 1,
                tuple(step_g(gi, states[gi]) for gi in range(ENC_G)))

    init = tuple(
        (zero, zero, op0_g[gi], phase0_g[gi], zero + 32, zero, zero, zero,
         zero, zero, zero, zero, zero, zero, zero, tile0_g[gi], zero)
        for gi in range(ENC_G))
    steps, states = jax.lax.while_loop(cond, body, (jnp.int32(0), init))

    for gi in range(ENC_G):
        op, err, tile = states[gi][2], states[gi][14], states[gi][15]
        for hh in range(SUB // 8):
            th = tile[hh * 8 : hh * 8 + 8]
            for r in range(8):
                rr = hh * 8 + r
                c2 = gi * SUB + rr
                out_ref[pl.ds(
                    c2 * OUT_ROWS + jnp.minimum(op[rr, 0] >> 7, OUT_ROWS - 1),
                    1), :] = th[r : r + 1, :]
        ok = err == 0
        meta_ref[pl.ds(gi * SUB, SUB), :] = jnp.where(
            lane == 0, op,
            jnp.where(lane == 1, ok.astype(I32),
                      jnp.where(lane == 2,
                                _rep(jnp.full((SUB, 1), steps, I32)), 0)))


@partial(jax.jit, static_argnames=("interpret",))
def _encode_impl(data, lengths, interpret: bool):
    B, L = data.shape
    rows = data.astype(I32).reshape(B * (L // LANES), LANES)
    G = B // SUBT
    out_rows, meta = pl.pallas_call(
        _encode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((SUBT * IN_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SUBT * OUT_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBT, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((SUB * TAB_ROWS, LANES), I32)
                            for _ in range(ENC_G)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * OUT_ROWS, LANES), I32),
            jax.ShapeDtypeStruct((B, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(lengths.astype(I32), rows)
    comp_lens = meta[:, 0]
    ok = meta[:, 1] > 0
    steps = meta[:, 2]
    out = out_rows.reshape(B, OUT_CAP)
    j = jnp.arange(OUT_CAP, dtype=I32)[None, :]
    out = jnp.where(j < comp_lens[:, None], out, 0).astype(jnp.uint8)
    return out, comp_lens, ok, steps


def encode(data, lengths, with_steps: bool = False):
    """Compress B chunks (≤64KB each) in ONE kernel launch.

    data (B, L≤65536) uint8 zero-padded, lengths (B,) int32. Returns
    (comp (B, OUT_CAP) u8, comp_lens, ok[, steps])."""
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
