"""LZ4 block ENCODE — sublane-batched Pallas TPU megakernel (SUB-way).

Format parity: reference lz4/Lz4RawCompressor.java:69-235 (greedy
single-hash matcher with skip acceleration SKIP_TRIGGER=6, 4-byte minimum
match, token = literal-nibble | match-nibble with 255-extension bytes,
LE16 offsets, MATCH_FIND_LIMIT=12 / LAST_LITERAL_SIZE=5 margins, final
literals-only sequence).

Same architecture as ops/snappy_encode_pallas.py (mutable VMEM hash
table, scheduler phases gated on an empty run queue, 128-byte window
drain engine), including its r5 UNIFIED-LOAD-SLOT engine: each step
issues exactly TWO phase-selected load pairs (slotA: drain-src / scan-ip
/ extend-fwd / bext-back / seed-probe; slotB: scan-cand / extend-cand /
bext-cand) + ONE merged hash-table RMW (scan insert | resume seed), with
backward "catch up" extension in its own BEXT phase and an inner M-step
fori_loop amortizing the termination reduction. Output is BIT-IDENTICAL
to the r4 kernel. LZ4's emission needs one more run source than
snappy's: FILL (a constant byte) for the 255-extension strings of long
lengths.

Scheduler chain per sequence:
  SCAN -> EXTEND [-> BEXT] -> TOK (token byte) -> [LITEXT fill +
  LITTERM byte] -> LITS (literal bytes) -> OFF (LE16) -> [MLEXT fill +
  MLTERM byte] -> SCAN;  TAIL emits the final literals-only -> DONE.
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
SUB = 8  # 16/32 miscompile the tab_ref RMW on current Mosaic (zstd kernels hit the same)
MAX_IN = 65536
IN_ROWS = MAX_IN // LANES
HASH_LOG = 14
TAB_ROWS = (1 << HASH_LOG) // LANES
# worst case: n + n/255 + 16 -> 65536 + 257 + 16 = 65809 -> 520 rows
OUT_ROWS = 520
OUT_CAP = OUT_ROWS * LANES
MATCH_FIND_LIMIT = 12  # matches may not START within this tail margin
LAST_LITERALS = 5  # matches may not END within this tail margin
MIN_MATCH = 4

(PH_SCAN, PH_EXTEND, PH_BEXT, PH_TOK, PH_LITEXT, PH_LITTERM, PH_LITS,
 PH_OFF, PH_MLEXT, PH_MLTERM, PH_TAIL, PH_DONE) = range(12)
SRC_INPUT, SRC_FILL = 0, 1


def _rep(x):
    return jnp.broadcast_to(x, (SUB, LANES))


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _encode_kernel(lens_ref, in_ref, out_ref, meta_ref, tab_ref):
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    zero = jnp.zeros((SUB, LANES), I32)
    nlen = _rep(
        jnp.stack([lens_ref[g * SUB + r] for r in range(SUB)]).reshape(SUB, 1))

    tab_ref[:, :] = jnp.full((SUB * TAB_ROWS, LANES), -1, I32)

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

    def win(pair, posv):
        a, b = pair
        return gather2(a, b, (posv & 127) + lane)

    def u32_at(pair, posv):
        a, b = pair
        pk = gather2(a, b, (posv & 127) + jnp.minimum(lane, 3))
        return (pk[:, 0:1] | (pk[:, 1:2] << 8) | (pk[:, 2:3] << 16)
                | (pk[:, 3:4] << 24))

    find_limit = nlen - MATCH_FIND_LIMIT
    match_limit = nlen - LAST_LITERALS
    phase0 = jnp.where(nlen <= 0, jnp.int32(PH_TAIL), jnp.int32(PH_SCAN))

    # carry: ip, anchor, op, phase, skip, cand, mlen, mend, litlen,
    #        rem, src, srckind, hdr0, hdr1, hdr2, hlen, err, tile
    def cond(c):
        steps, st = c
        phase, rem, hlen, err = st[3], st[9], st[15], st[16]
        pending = (rem[:, 0:1] > 0) | (hlen[:, 0:1] > 0)
        live = (err[:, 0:1] == 0) & ((phase[:, 0:1] != PH_DONE) | pending)
        return (jnp.max(live.astype(I32)) > 0) & (steps < 6 * MAX_IN)

    def step_one(c):
        (ip, anchor, op, phase, skip, cand, mlen, mend, litlen,
         rem, src, srckind, hdr0, hdr1, hdr2, hlen, err,
         tile) = c
        pending = (rem > 0) | (hlen > 0)
        live = (err == 0) & ((phase != PH_DONE) | pending)
        need = live & ~pending & (phase != PH_DONE)
        in_bext = need & (phase == PH_BEXT)
        emit_run_pre = live & pending & (hlen <= 0) & (rem > 0)
        # resume steps (seed-probe) — computed early for slotA selection
        in_off_e = need & (phase == PH_OFF)
        in_mlterm_e = need & (phase == PH_MLTERM)
        res_e = (in_off_e & (mlen - MIN_MATCH < 15)) | in_mlterm_e

        # ---------------- load slot A (phase-selected position)
        posA = jnp.where(
            emit_run_pre & (srckind == SRC_INPUT), src,
            jnp.where(need & (phase == PH_SCAN), ip,
                      jnp.where(need & (phase == PH_EXTEND), ip + mlen,
                                jnp.where(in_bext, ip - 128,
                                          jnp.maximum(mend - 2, 0)))))
        pairA = in_pair(posA)
        wA = win(pairA, posA)
        u32A = u32_at(pairA, posA)

        # ---------------- PH_SCAN + merged table RMW (scan insert |
        # resume seed mend-2, reference Lz4RawCompressor.java:167-168 —
        # mutually exclusive phases)
        in_scan = need & (phase == PH_SCAN)
        can_scan = ip < find_limit
        h = _srl(u32A * jnp.int32(np.int32(np.uint32(2654435761))),
                 32 - HASH_LOG)
        upd = ((in_scan & can_scan) | (res_e & (mend >= 2))).astype(I32)
        ins = jnp.where(res_e, mend - 2, ip)
        cands = []
        for r in range(SUB):
            trow = jnp.clip(h[r, 0] >> 7, 0, TAB_ROWS - 1)
            row = tab_ref[pl.ds(r * TAB_ROWS + trow, 1), :]
            cands.append(row)
            hl = h[r, 0] & 127
            lv = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
            tab_ref[pl.ds(r * TAB_ROWS + trow, 1), :] = jnp.where(
                jnp.logical_and(lv == hl, upd[r, 0] > 0), ins[r, 0], row)

        C = jnp.concatenate(cands, axis=0)
        cand_v = jnp.take_along_axis(
            C, jnp.broadcast_to(h & 127, (SUB, LANES)), axis=1)[:, 0:1]

        # ---------------- load slot B (phase-selected position)
        posB = jnp.where(
            in_scan, jnp.maximum(cand_v, 0),
            jnp.where(need & (phase == PH_EXTEND), cand + mlen,
                      jnp.where(in_bext, cand - 128, zero)))
        pairB = in_pair(posB)
        wB = win(pairB, posB)
        u32B = u32_at(pairB, posB)

        hit = can_scan & (cand_v >= 0) & (cand_v < ip) & (u32B == u32A)
        # skip acceleration (reference SKIP_TRIGGER=6:
        # step = findMatchAttempts++ >>> 6, starting at 64)
        adv = _srl(skip, 6)
        sc_ip = jnp.where(hit, ip, ip + adv)
        sc_skip = jnp.where(hit, jnp.int32(64), skip + 1)
        sc_phase = jnp.where(
            can_scan, jnp.where(hit, jnp.int32(PH_EXTEND), phase),
            jnp.int32(PH_TAIL))
        sc_cand = jnp.where(hit, cand_v, cand)
        sc_mlen = jnp.where(hit, MIN_MATCH, mlen)

        # ---------------- PH_EXTEND (cap at match_limit)
        in_ext = need & (phase == PH_EXTEND)
        cap128 = jnp.clip(match_limit - (ip + mlen), 0, 128)
        neq = (wA != wB) | (lane >= cap128)
        add = jnp.min(jnp.where(neq, lane, 128), axis=1, keepdims=True)
        ex_mlen = mlen + add
        ex_done = (add < 128) | (ip + ex_mlen >= match_limit)
        backroom = jnp.minimum(ip - anchor, cand) > 0
        ext_next = jnp.where(backroom, jnp.int32(PH_BEXT),
                             jnp.int32(PH_TOK))

        # ---------------- PH_BEXT ("catch up", Lz4RawCompressor.java:
        # 141-144): grow the match into the pending literals while the
        # preceding bytes also match (window'd to 127B; the offset is
        # unchanged since both ends shift). slotA/slotB hold the backward
        # windows at ip-128 / cand-128.
        cap_back = jnp.clip(jnp.minimum(ip - anchor, cand), 0, 127)
        badl = (wA != wB) | (lane < 128 - cap_back)
        last_bad = jnp.max(jnp.where(badl, lane, -1), axis=1, keepdims=True)
        bx_back = 127 - last_bad

        # ---------------- scheduling helpers
        in_tok = need & (phase == PH_TOK)
        in_litext = need & (phase == PH_LITEXT)
        in_litterm = need & (phase == PH_LITTERM)
        in_lits = need & (phase == PH_LITS)
        in_off = in_off_e
        in_mlext = need & (phase == PH_MLEXT)
        in_mlterm = in_mlterm_e
        in_tail = need & (phase == PH_TAIL)

        is_tail_ctx = mend < 0  # TAIL marks mend=-1: literals-only sequence
        lit_n = litlen
        lit_ext = lit_n - 15  # valid when lit_n >= 15
        ml_n = mlen - MIN_MATCH
        ml_ext = ml_n - 15
        d = ip - cand

        tok = (jnp.minimum(lit_n, 15) << 4) | jnp.where(
            is_tail_ctx, 0, jnp.minimum(ml_n, 15))
        tok_next = jnp.where(
            lit_n >= 15, jnp.int32(PH_LITEXT),
            jnp.where(lit_n > 0, jnp.int32(PH_LITS),
                      jnp.where(is_tail_ctx, jnp.int32(PH_DONE),
                                jnp.int32(PH_OFF))))
        litext_fills = jnp.maximum(lit_ext, 0) // 255
        litext_term = jnp.maximum(lit_ext, 0) - litext_fills * 255
        mlext_fills = jnp.maximum(ml_ext, 0) // 255
        mlext_term = jnp.maximum(ml_ext, 0) - mlext_fills * 255
        lits_next = jnp.where(is_tail_ctx, jnp.int32(PH_DONE),
                              jnp.int32(PH_OFF))
        off_next = jnp.where(ml_n >= 15, jnp.int32(PH_MLEXT),
                             jnp.int32(PH_SCAN))

        # ---------------- TAIL entry: set up the literals-only sequence
        tl = in_tail
        tl_lit = nlen - anchor

        # ---------------- scheduler merge
        n_ip = jnp.where(in_scan, sc_ip, ip)
        n_skip = jnp.where(in_scan, sc_skip, skip)
        n_cand = jnp.where(in_scan, sc_cand, cand)
        n_mlen = jnp.where(in_scan, sc_mlen,
                           jnp.where(in_ext, ex_mlen,
                                     jnp.where(in_bext, mlen + bx_back,
                                               mlen)))
        n_mend = jnp.where(in_ext & ex_done, ip + ex_mlen,
                           jnp.where(tl, -1, mend))
        n_litlen = jnp.where(in_ext & ex_done & ~backroom, ip - anchor,
                             jnp.where(in_bext, ip - bx_back - anchor,
                                       jnp.where(tl, tl_lit, litlen)))
        resume = in_off & (ml_n < 15)
        resume2 = in_mlterm
        n_phase = jnp.where(in_scan, sc_phase, phase)
        n_phase = jnp.where(in_ext & ex_done, ext_next, n_phase)
        n_phase = jnp.where(in_bext, jnp.int32(PH_TOK), n_phase)
        n_phase = jnp.where(tl, jnp.int32(PH_TOK), n_phase)
        n_phase = jnp.where(in_tok, tok_next, n_phase)
        n_phase = jnp.where(in_litext, jnp.int32(PH_LITTERM), n_phase)
        n_phase = jnp.where(
            in_litterm, jnp.where(lit_n > 0, jnp.int32(PH_LITS), lits_next),
            n_phase)
        n_phase = jnp.where(in_lits, lits_next, n_phase)
        n_phase = jnp.where(in_off, off_next, n_phase)
        n_phase = jnp.where(in_mlext, jnp.int32(PH_MLTERM), n_phase)
        n_phase = jnp.where(in_mlterm, jnp.int32(PH_SCAN), n_phase)
        # scan resumes at the match end
        res = resume | resume2
        n_ip = jnp.where(res, mend, n_ip)
        n_anchor = jnp.where(res, mend, anchor)
        n_skip = jnp.where(res, jnp.int32(64), n_skip)
        # (resume seed RMW is merged into the slotA table RMW above)

        # run scheduling
        sched_h1 = in_tok | in_litterm | in_mlterm  # one header byte
        h1val = jnp.where(in_tok, tok,
                          jnp.where(in_litterm, litext_term, mlext_term))
        sched_off = in_off  # two header bytes
        n_hdr0 = jnp.where(sched_h1, h1val,
                           jnp.where(sched_off, d & 255, hdr0))
        n_hdr1 = jnp.where(sched_off, _srl(d, 8), hdr1)
        n_hdr2 = hdr2
        n_hlen = jnp.where(sched_h1, 1, jnp.where(sched_off, 2, hlen))
        sched_fill = in_litext | in_mlext
        sched_input = in_lits
        n_rem = jnp.where(sched_fill,
                          jnp.where(in_litext, litext_fills, mlext_fills),
                          jnp.where(sched_input, lit_n, rem))
        n_src = jnp.where(sched_input, anchor, src)
        n_srckind = jnp.where(sched_fill, SRC_FILL,
                              jnp.where(sched_input, SRC_INPUT, srckind))
        # a zero-length fill run (ext < 255) needs no drain; the phase
        # advance above already moved on, rem stays 0

        # ---------------- drain engine
        o = op & 127
        emit_hdr = live & (hlen > 0)
        emit_run = live & (hlen <= 0) & (rem > 0)
        hrow = jnp.where(lane == 0, hdr0,
                         jnp.where(lane == 1, hdr1,
                                   jnp.where(lane == 2, hdr2, 0)))
        take_h = jnp.where(emit_hdr, jnp.minimum(hlen, 128 - o), 0)
        take_l = jnp.where(emit_run, jnp.minimum(rem, 128 - o), 0)
        take = take_h + take_l
        idx_h = lane - o
        placed = jnp.where(
            jnp.broadcast_to(emit_hdr, (SUB, LANES)),
            gather2(hrow, zero, idx_h & 255),
            jnp.where(jnp.broadcast_to(srckind == SRC_FILL, (SUB, LANES)),
                      jnp.full((SUB, LANES), 255, I32),
                      jnp.take_along_axis(
                          wA, jnp.clip(lane - o, 0, LANES - 1), axis=1)))
        mask = (lane >= o) & (lane < o + take)
        n_tile = jnp.where(mask, placed, tile)
        n_op = op + take
        crossed = ((n_op & 127) == 0) & (take > 0)
        # unconditional per-chunk store of the in-progress tile: on a
        # crossing iteration this is the row's final value; otherwise a
        # partial write nothing reads (output is write-only). Row clipped:
        # an errored chunk can park op at OUT_CAP (its output is invalid).
        for r in range(SUB):
            out_ref[pl.ds(
                r * OUT_ROWS + jnp.minimum(op[r, 0] >> 7, OUT_ROWS - 1),
                1), :] = n_tile[r : r + 1, :]
        n_tile = jnp.where(crossed, zero, n_tile)

        s0 = jnp.where(take_h == 1, hdr1, jnp.where(take_h == 2, hdr2, hdr0))
        s1 = jnp.where(take_h == 1, hdr2, hdr1)
        n_hdr0 = jnp.where(emit_hdr, s0, n_hdr0)
        n_hdr1 = jnp.where(emit_hdr, s1, n_hdr1)
        n_hlen = jnp.where(emit_hdr, hlen - take_h, n_hlen)
        n_rem = jnp.where(emit_run, rem - take_l, n_rem)
        n_src = jnp.where(emit_run & (srckind == SRC_INPUT),
                          src + take_l, n_src)

        n_err = err | (live & (n_op + 8 > OUT_CAP)).astype(I32)
        return (n_ip, n_anchor, n_op, n_phase, n_skip, n_cand, n_mlen,
                n_mend, n_litlen, n_rem, n_src, n_srckind,
                n_hdr0, n_hdr1, n_hdr2, n_hlen, n_err, n_tile)

    init = (zero, zero, zero, phase0, zero + 64, zero, zero, zero, zero,
            zero, zero, zero, zero, zero, zero, zero, zero, zero)
    M = 8  # steps between termination-reduction checks

    def body(c):
        steps, st = c
        for _ in range(M):
            st = step_one(st)
        return (steps + M, st)

    steps, out = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    op, err, tile = out[2], out[16], out[17]

    for r in range(SUB):
        out_ref[pl.ds(
            r * OUT_ROWS + jnp.minimum(op[r, 0] >> 7, OUT_ROWS - 1),
            1), :] = tile[r : r + 1, :]

    ok = err == 0
    meta_ref[:, :] = jnp.where(
        lane == 0, op,
        jnp.where(lane == 1, ok.astype(I32),
                  jnp.where(lane == 2, _rep(jnp.full((SUB, 1), steps, I32)),
                            0)))


@partial(jax.jit, static_argnames=("interpret",))
def _encode_impl(data, lengths, interpret: bool):
    B, L = data.shape
    rows = data.astype(I32).reshape(B * (L // LANES), LANES)
    G = B // SUB
    out_rows, meta = pl.pallas_call(
        _encode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((SUB * IN_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SUB * OUT_ROWS, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((SUB * TAB_ROWS, LANES), I32)],
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
    pad_b = (-B) % SUB
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
