"""Snappy block decode — unified-buffer, group-interleaved Pallas megakernel.

Format parity: reference snappy/SnappyRawDecompressor.java:30-220 (varint
length, tag dispatch, strict validation). Successor to the r2 single-token
kernel (snappy_pallas8); round 4 reworked the emission engine from the
live-regime ablation (per body of 64 group-steps: flush stores ~2.1us,
emission vector chain ~0.5us, source loads ~0.7us — the kernel is
store/VPU-issue bound, NOT scalar-load bound as r3 assumed):

1. ONE unified [input | output] VMEM address space per chunk: a token's
   source (literal bytes from the input region, match bytes from the
   output history) is a single (2,128) dynamic slice.
2. G independent interleaved chunk groups give the scheduler G dependency
   chains to overlap (the VPU absorbs ~8 streams for free).
3. TWO-register output window with crossing CONTINUATION (r4): tileA is
   the current 128B output row, tileB the completed row before it. A row
   crossing rolls the window (B<-A, A<-0) and stepping continues; in the
   body's second row, emission stops one byte short of the row end so a
   second crossing (which would evict tileB before the flush stored it)
   cannot happen. Kills the r3 kernel's crossing-idle (it closed the
   chunk for the body's remaining steps).
4. ONE absolute source pointer per chunk (r4): literals point into the
   input region, copies into output history; take caps at
   avail = OUTBASE + op - srcptr (provably >= rem for literals since
   src + rem <= clen <= OUTBASE). Overlap (RLE) acceleration: a full-gap
   take leaves srcptr in place, doubling the gap — the register-window
   equivalent of the reference's DEC_32/DEC_64 wild-copy trick.
5. Flush = ONE (1,128) store per chunk per body: tileB at row
   (op>>7)-1. Memory only ever serves rows <= op>>7 - 2 (the register
   pair covers the top two), so a completed row's final content is
   always stored before memory can read it.

Known negative result (r4, documented for future rounds): flushing every
SECOND body with a 3-register window is algorithmically sound (verified in
interpret mode) but miscompiles on current Mosaic — copies near the
register/memory boundary read stale/zero data, deterministically, only on
device and only with the 2-body cadence (scratch/snappy_w4*.py keeps the
repro family). The same single-store-per-body cadence below is stable.

Layout contract matches snappy_pallas8.decode (same wrapper signature).
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
SUBG = int(__import__('os').environ.get('W_SUBG', '16'))
G = int(__import__('os').environ.get('W_G', '4'))
SUB = SUBG * G  # chunks per grid step
K = int(__import__('os').environ.get('W_K', '8'))
M = 16  # bodies between termination checks
OUT_ROWS = 512  # 64KB output per chunk
PAD_ROWS = 8
OUT_ROWSP = OUT_ROWS + PAD_ROWS
MAX_OUT = OUT_ROWS * LANES


def _rep(x):
    return jnp.broadcast_to(x, (SUBG, LANES))


def _decode_kernel(lens_ref, in_ref, uni_ref, meta_ref, *scr_refs):
    g0 = pl.program_id(0)
    Rc = in_ref.shape[0] // SUB
    RT = Rc + OUT_ROWSP  # unified rows per chunk: [input | output]
    OUTBASE = Rc * LANES
    lane = jax.lax.broadcasted_iota(I32, (SUBG, LANES), 1)
    zero = jnp.zeros((SUBG, LANES), I32)

    # ---- stage the input region of the unified buffer (one slice per chunk)
    for r in range(SUB):
        uni_ref[pl.ds(r * RT, Rc), :] = in_ref[pl.ds(r * Rc, Rc), :]

    def gather2(row_a, row_b, idx):
        m = idx & 127
        return jnp.where(
            idx < 128,
            jnp.take_along_axis(row_a, m, axis=1),
            jnp.take_along_axis(row_b, m, axis=1),
        )

    # ---- per-group constants: varint uncompressed length (<=5 bytes)
    clen_g, declared_g, vlen_g, err0_g = [], [], [], []
    for gi in range(G):
        clen_g.append(_rep(jnp.stack(
            [lens_ref[g0 * SUB + gi * SUBG + r] for r in range(SUBG)]
        ).reshape(SUBG, 1)))
        decs, vlens = [], []
        for r in range(SUBG):
            c = gi * SUBG + r
            v = [in_ref[c * Rc, k] for k in range(5)]
            declared = v[0] & 0x7F
            vlen = jnp.int32(1)
            carry = v[0] >= 128
            for k in range(1, 5):
                declared = jnp.where(
                    carry, declared | ((v[k] & 0x7F) << (7 * k)), declared)
                vlen = vlen + carry.astype(I32)
                if k < 4:
                    carry = carry & (v[k] >= 128)
            decs.append(declared)
            vlens.append(vlen)
        declared_g.append(_rep(jnp.stack(decs).reshape(SUBG, 1)))
        vlen_g.append(_rep(jnp.stack(vlens).reshape(SUBG, 1)))
        err0_g.append(((declared_g[gi] > MAX_OUT) | (vlen_g[gi] > clen_g[gi])
                       | (clen_g[gi] > Rc * LANES)).astype(I32))

    # per-group carry: ip, op, rem, srcptr, err, tileA, tileB
    def cond(c):
        steps = c[0]
        live = None
        for gi in range(G):
            ip, rem, err = c[1][gi][0], c[1][gi][2], c[1][gi][4]
            lg = (err == 0) & ((rem > 0) | (ip < clen_g[gi]))
            live = lg if live is None else (live | lg)
        # one fused reduction for the whole grid step
        return (jnp.max(live.astype(I32)) > 0) & (steps < 2 * MAX_OUT)

    def hdr_load(gi, hrow):
        # one vector store + SUBG scalar loads instead of SUBG
        # vector->scalar extracts (each extract is a pipeline sync).
        scr_refs[gi][...] = hrow
        hp = []
        for r in range(SUBG):
            c = gi * SUBG + r
            h = jnp.clip(scr_refs[gi][r, 0], 0, Rc - 2)
            hp.append(uni_ref[pl.ds(c * RT + h, 2), :])
        Ha = jnp.concatenate([p[0:1] for p in hp], axis=0)
        Hb = jnp.concatenate([p[1:2] for p in hp], axis=0)
        return Ha, Hb

    def token_step(gi, st, env):
        """One token parse+emit for group gi. st/env are per-group."""
        ip, op, rem, srcptr, err, tileA, tileB = st
        Ha, Hb, hbase, wrow0, open_ = env
        clen, declared = clen_g[gi], declared_g[gi]

        err_b = err > 0
        active = ~err_b & ((rem > 0) | (ip < clen)) & open_
        need = (rem == 0) & active
        stall = need & (ip + 5 > hbase + 2 * LANES)
        parse = need & ~stall

        hs = ip - hbase
        pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 5))
        tag = _rep(pk[:, 0:1])
        b1 = _rep(pk[:, 1:2])
        b2 = _rep(pk[:, 2:3])
        b3 = _rep(pk[:, 3:4])
        b4 = _rep(pk[:, 4:5])

        ttype = tag & 3
        n = tag >> 2
        lit_extra = jnp.clip(n - 59, 0, 4)
        ext = jnp.where(
            lit_extra == 0, n + 1,
            jnp.where(
                lit_extra == 1, b1 + 1,
                jnp.where(
                    lit_extra == 2, (b1 | (b2 << 8)) + 1,
                    jnp.where(
                        lit_extra == 3, (b1 | (b2 << 8) | (b3 << 16)) + 1,
                        (b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)) + 1,
                    ),
                ),
            ),
        )
        is_lit_tok = ttype == 0
        c1_len = 4 + ((tag >> 2) & 7)
        c1_dist = ((tag >> 5) << 8) | b1
        c2_len = n + 1
        c2_dist = b1 | (b2 << 8)
        c4_dist = b1 | (b2 << 8) | (b3 << 16)
        cp_len = jnp.where(ttype == 1, c1_len, c2_len)
        cp_dist = jnp.where(
            ttype == 1, c1_dist, jnp.where(ttype == 2, c2_dist, c4_dist))
        tok_size = jnp.where(
            is_lit_tok,
            1 + lit_extra,
            jnp.where(ttype == 1, 2, jnp.where(ttype == 2, 3, 5)),
        )
        p_rem = jnp.where(is_lit_tok, ext, cp_len)
        # (b4 != 0 on 4-byte-offset copies is subsumed: dist >= 1<<24 > op
        # when positive, and cp_dist <= 0 catches the b4<<24 sign overflow)
        p_err = (
            (p_rem < 0)
            | (p_rem > MAX_OUT)
            | (ip + tok_size > clen)
            | (is_lit_tok & (ip + tok_size + jnp.clip(ext, 0, MAX_OUT) > clen))
            | (op + jnp.clip(p_rem, 0, MAX_OUT) > declared)
            | (~is_lit_tok) & ((cp_dist <= 0) | (cp_dist > op))
        )

        rem = jnp.where(parse, p_rem, rem)
        srcptr = jnp.where(
            parse,
            jnp.where(is_lit_tok, ip + tok_size, OUTBASE + op - cp_dist),
            srcptr)
        ip = jnp.where(
            parse, ip + tok_size + jnp.where(is_lit_tok, ext, 0), ip)
        err = err | (parse & p_err).astype(I32)
        open_ = open_ & ~stall & ~(err > 0)

        # ---- emit this step's run slice into the register window
        o = op & 127
        cwrow = op >> 7
        emit = open_ & (rem > 0) & active
        is_copy = emit & (srcptr >= OUTBASE)
        take = jnp.minimum(rem, 128 - o)
        # in the body's SECOND row, stop one byte short of the row end: a
        # second crossing would evict tileB (a completed row) before the
        # flush could store it
        second = cwrow > wrow0
        take = jnp.where(second, jnp.minimum(take, 127 - o), take)
        # copies may not read at/after op; literals have avail >= rem
        avail = OUTBASE + op - srcptr
        take = jnp.minimum(take, avail)
        take = jnp.where(emit, take, 0)

        q = srcptr
        qr = q >> 7

        scr_refs[gi][...] = qr
        rows_a, rows_b = [], []
        for r in range(SUBG):
            c = gi * SUBG + r
            qq = jnp.clip(scr_refs[gi][r, 0], 0, RT - 2)
            pr = uni_ref[pl.ds(c * RT + qq, 2), :]
            rows_a.append(pr[0:1])
            rows_b.append(pr[1:2])
        La = jnp.concatenate(rows_a, axis=0)
        Lb = jnp.concatenate(rows_b, axis=0)

        spos = q + lane - o  # absolute unified source byte per lane
        v_far = gather2(La, Lb, (spos - (qr << 7)) & 255)
        # register-window sources: rows cwrow (tileA) and cwrow-1 (tileB)
        is_copy_b = jnp.broadcast_to(is_copy[:, 0:1], (SUBG, LANES))
        rowA_start = OUTBASE + (cwrow << 7)
        in_A = is_copy_b & (spos >= rowA_start)
        in_B = is_copy_b & (spos >= rowA_start - 128) & ~in_A
        m127 = spos & 127
        v_tA = jnp.take_along_axis(tileA, m127, axis=1)
        v_tB = jnp.take_along_axis(tileB, m127, axis=1)
        value = jnp.where(in_A, v_tA, jnp.where(in_B, v_tB, v_far))

        mask = (lane >= o) & (lane < o + take)
        tileA = jnp.where(mask, value, tileA)
        op = op + take
        rem = rem - take
        # overlap (RLE) acceleration: a full-gap take leaves srcptr in
        # place, doubling the gap (the copied bytes are now valid source)
        srcptr = srcptr + jnp.where(take == avail, 0, take)
        crossed = ((op & 127) == 0) & (take > 0)
        # continuation: roll the window on the (only possible) crossing
        crossed_b = jnp.broadcast_to(crossed[:, 0:1], (SUBG, LANES))
        tileB = jnp.where(crossed_b, tileA, tileB)
        tileA = jnp.where(crossed_b, zero, tileA)
        # second row filled to its cap (byte 127) with output pending:
        # nothing more can emit this body
        open_ = open_ & ~(second & ((op & 127) == 127) & (rem > 0))

        return (ip, op, rem, srcptr, err, tileA, tileB), open_

    def body(c):
        steps, states = c
        envs = []
        for gi in range(G):
            ip, op = states[gi][0], states[gi][1]
            wrow0 = op >> 7
            hrow = ip >> 7
            Ha, Hb = hdr_load(gi, hrow)
            hbase = jnp.maximum(jnp.minimum(hrow, Rc - 2), 0) << 7
            open_ = jnp.ones((SUBG, LANES), jnp.bool_)
            envs.append([Ha, Hb, hbase, wrow0, open_])
        sts = list(states)
        # interleave: step each group once, round-robin, K times — the G
        # chains are data-independent so the scheduler overlaps them
        for _ in range(K):
            for gi in range(G):
                sts[gi], open_ = token_step(gi, sts[gi], envs[gi])
                envs[gi][4] = open_

        # ---- flush: tileB (the last COMPLETED row) at row op>>7 - 1
        out_states = []
        for gi in range(G):
            ip, op, rem, srcptr, err, tileA, tileB = sts[gi]
            fr = (op >> 7) - 1
            scr_refs[gi][...] = fr
            for r in range(SUBG):
                c = gi * SUBG + r
                row = Rc + jnp.clip(scr_refs[gi][r, 0], 0, OUT_ROWSP - 1)
                uni_ref[pl.ds(c * RT + row, 1), :] = tileB[r: r + 1, :]
            out_states.append((ip, op, rem, srcptr, err, tileA, tileB))
        return (steps + 1, tuple(out_states))

    init_states = tuple(
        (vlen_g[gi], zero, zero, zero, err0_g[gi], zero, zero)
        for gi in range(G))

    def outer_body(c):
        return jax.lax.fori_loop(0, M, lambda _, cc: body(cc), c)

    steps, states = jax.lax.while_loop(
        cond, outer_body, (jnp.int32(0), init_states))

    # final flush: tileA holds the last (possibly partial) row, tileB the
    # completed row before it. Ordered stores with per-row clips: when rows
    # collide at 0 after clipping, the LAST (newest) store wins.
    for gi in range(G):
        ip, op, rem, err, tileA, tileB = (
            states[gi][0], states[gi][1], states[gi][2], states[gi][4],
            states[gi][5], states[gi][6])
        fr = (op >> 7) - 1
        scr_refs[gi][...] = fr
        for r in range(SUBG):
            c = gi * SUBG + r
            row = Rc + jnp.clip(scr_refs[gi][r, 0], 0, OUT_ROWSP - 1)
            uni_ref[pl.ds(c * RT + row, 1), :] = tileB[r: r + 1, :]
            rowa = Rc + jnp.clip(scr_refs[gi][r, 0] + 1, 0, OUT_ROWSP - 1)
            uni_ref[pl.ds(c * RT + rowa, 1), :] = tileA[r: r + 1, :]
        ok = (err == 0) & (op == declared_g[gi]) & (rem == 0)
        meta_ref[pl.ds(gi * SUBG, SUBG), :] = jnp.where(
            lane == 0, op,
            jnp.where(lane == 1, ok.astype(I32),
                      jnp.where(lane == 2, _rep(jnp.full((SUBG, 1), steps, I32)),
                                0)))


@partial(jax.jit, static_argnames=("interpret",))
def _decode_impl(comp, comp_lens, interpret: bool):
    B, Lc = comp.shape
    Rc = Lc // LANES
    RT = Rc + OUT_ROWSP
    rows = comp.astype(I32).reshape(B * Rc, LANES)
    NG = B // SUB
    uni_rows, meta = pl.pallas_call(
        _decode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NG,),
            in_specs=[
                pl.BlockSpec((SUB * Rc, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SUB * RT, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((SUBG, LANES), I32) for _ in range(G)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * RT, LANES), I32),
            jax.ShapeDtypeStruct((B, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(comp_lens.astype(I32), rows)
    out_lens = meta[:, 0]
    ok = meta[:, 1] > 0
    steps = meta[:, 2]
    out = uni_rows.reshape(B, RT * LANES)[:, Rc * LANES : Rc * LANES + MAX_OUT]
    j = jnp.arange(MAX_OUT, dtype=I32)[None, :]
    out = jnp.where(j < out_lens[:, None], out, 0).astype(jnp.uint8)
    return out, out_lens, ok, steps


def decode(comp, comp_lens, out_cap: int = MAX_OUT, with_steps: bool = False):
    """Decode B snappy blocks (<=64KB decompressed each), unified-buffer
    group-interleaved two-register-window engine, ONE kernel launch. Same
    contract as snappy_pallas8.decode."""
    assert out_cap <= MAX_OUT
    B, Lc = comp.shape
    pad_b = (-B) % SUB
    if pad_b:
        pad = jnp.zeros((pad_b, Lc), comp.dtype)
        comp = jnp.concatenate([comp, pad], axis=0)
        comp_lens = jnp.concatenate(
            [comp_lens, jnp.ones((pad_b,), comp_lens.dtype)])
    comp = jnp.pad(comp, ((0, 0), (0, 1024 + (-Lc) % 1024)))
    interpret = jax.default_backend() != "tpu"
    out, out_lens, ok, steps = _decode_impl(comp, comp_lens, interpret)
    if pad_b:
        out, out_lens, ok, steps = out[:B], out_lens[:B], ok[:B], steps[:B]
    ok = ok & (out_lens <= MAX_OUT)
    if out_cap != MAX_OUT:
        out = out[:, :out_cap]
        ok = ok & (out_lens <= out_cap)
    if with_steps:
        return out, out_lens, ok, steps
    return out, out_lens, ok
