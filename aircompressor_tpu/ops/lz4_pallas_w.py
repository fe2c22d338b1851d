"""LZ4 block decode — unified-buffer, group-interleaved Pallas megakernel.

Format parity: reference lz4/Lz4RawDecompressor.java:35-198 (token = 4-bit
literal length | 4-bit match length, 255-extension bytes, 2-byte LE offset,
strict bounds, last-literals rule). Same architecture as
ops/snappy_pallas_w.py (see its docstring for the measured bottlenecks
and the r4 emission engine: unified [input|output] VMEM address space, G
interleaved chunk groups for VPU ILP, two-register output window with
crossing continuation, one absolute source pointer with stay-in-place
overlap acceleration, one flush store per chunk per body); the
difference is the parse machine — LZ4 sequences drive a literal run AND
a match run with unbounded 255-extension byte strings, so each chunk
carries a PHASE:

  0 TOKEN     parse token byte; short literal runs launch immediately
  1 LITEXT    consume <=4 literal-length extension bytes per step
  2 MATCHHDR  parse the 2-byte LE offset (or detect end-of-input after
              the final literals-only sequence)
  3 MLEXT     consume <=4 match-length extension bytes per step

Layout contract matches the r2 kernel's decode (same wrapper signature).
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
SUBG = 8  # chunks per group (sublanes of one vreg)
G = 8  # interleaved independent groups
SUB = SUBG * G
K = 8  # parse/emit steps per iteration
M = 16  # bodies between termination checks
OUT_ROWS = 512  # 64KB output per chunk
PAD_ROWS = 8
OUT_ROWSP = OUT_ROWS + PAD_ROWS
MAX_OUT = OUT_ROWS * LANES

PH_TOKEN, PH_LITEXT, PH_MATCHHDR, PH_MLEXT = 0, 1, 2, 3


def _rep(x):
    return jnp.broadcast_to(x, (SUBG, LANES))


def _decode_kernel(lens_ref, in_ref, uni_ref, meta_ref, *scr_refs):
    g0 = pl.program_id(0)
    Rc = in_ref.shape[0] // SUB
    RT = Rc + OUT_ROWSP  # unified rows per chunk: [input | output]
    OUTBASE = Rc * LANES
    lane = jax.lax.broadcasted_iota(I32, (SUBG, LANES), 1)
    zero = jnp.zeros((SUBG, LANES), I32)

    for r in range(SUB):
        uni_ref[pl.ds(r * RT, Rc), :] = in_ref[pl.ds(r * Rc, Rc), :]

    def gather2(row_a, row_b, idx):
        m = idx & 127
        return jnp.where(
            idx < 128,
            jnp.take_along_axis(row_a, m, axis=1),
            jnp.take_along_axis(row_b, m, axis=1),
        )

    clen_g, err0_g = [], []
    for gi in range(G):
        clen = _rep(jnp.stack(
            [lens_ref[g0 * SUB + gi * SUBG + r] for r in range(SUBG)]
        ).reshape(SUBG, 1))
        clen_g.append(clen)
        err0_g.append(((clen <= 0) | (clen > Rc * LANES)).astype(I32))

    # per-group carry: ip, op, rem, srcptr, phase, acc, pend_ml, err,
    #                  tileA, tileB
    def cond(c):
        steps = c[0]
        live = None
        for gi in range(G):
            ip, rem, err = c[1][gi][0], c[1][gi][2], c[1][gi][7]
            lg = (err == 0) & ((rem > 0) | (ip < clen_g[gi]))
            live = lg if live is None else (live | lg)
        return (jnp.max(live.astype(I32)) > 0) & (steps < 2 * MAX_OUT)

    def hdr_load(gi, hrow):
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
        (ip, op, rem, srcptr, phase, acc, pend_ml, err, tileA, tileB) = st
        Ha, Hb, hbase, wrow0, open_ = env
        clen = clen_g[gi]

        active = (err == 0) & ((rem > 0) | (ip < clen)) & open_
        need = (rem == 0) & active
        stall = need & (ip + 5 > hbase + 2 * LANES)
        parse = need & ~stall

        hs = ip - hbase
        pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 5))
        b0 = _rep(pk[:, 0:1])
        b1 = _rep(pk[:, 1:2])
        b2 = _rep(pk[:, 2:3])
        b3 = _rep(pk[:, 3:4])

        # ---- phase TOKEN
        t_lit = b0 >> 4
        t_ml = b0 & 15
        tok_short = t_lit < 15
        tk_rem = jnp.where(tok_short, t_lit, 0)
        tk_phase = jnp.where(tok_short, PH_MATCHHDR, PH_LITEXT)
        tk_ip = ip + 1
        tk_acc = jnp.full_like(acc, 15)

        # ---- phases LITEXT / MLEXT: swallow <=4 extension bytes
        is255_0 = (b0 == 255).astype(I32)
        is255_1 = is255_0 * (b1 == 255).astype(I32)
        is255_2 = is255_1 * (b2 == 255).astype(I32)
        is255_3 = is255_2 * (b3 == 255).astype(I32)
        k255 = is255_0 + is255_1 + is255_2 + is255_3
        term = jnp.where(
            k255 == 0, b0, jnp.where(k255 == 1, b1, jnp.where(
                k255 == 2, b2, jnp.where(k255 == 3, b3, 0))))
        ext_done = k255 < 4
        ex_acc = acc + 255 * k255 + jnp.where(ext_done, term, 0)
        ex_ip = ip + k255 + jnp.where(ext_done, 1, 0)

        # ---- phase MATCHHDR (a stream that runs out of input parked here
        # ended with its final literals — reference last-literals rule,
        # Lz4RawDecompressor.java:168-171; need is false at ip==clen)
        offset = b0 | (b1 << 8)
        mh_short = pend_ml < 15
        mh_rem = jnp.where(mh_short, pend_ml + 4, 0)
        mh_phase = jnp.where(mh_short, PH_TOKEN, PH_MLEXT)
        mh_ip = ip + 2
        mh_err = (offset <= 0) | (offset > op)

        # ---- merge parse results by phase
        ph_tok = parse & (phase == PH_TOKEN)
        ph_lx = parse & (phase == PH_LITEXT)
        ph_mh = parse & (phase == PH_MATCHHDR)
        ph_mx = parse & (phase == PH_MLEXT)

        acc = jnp.where(
            ph_tok | (ph_mh & ~mh_short), tk_acc,
            jnp.where(ph_lx | ph_mx, ex_acc, acc))
        lx_launch = ph_lx & ext_done
        mx_launch = ph_mx & ext_done
        p_rem = jnp.where(
            ph_tok, tk_rem,
            jnp.where(lx_launch, ex_acc,
                      jnp.where(ph_mh, mh_rem,
                                jnp.where(mx_launch, ex_acc + 4, 0))))
        new_ip = jnp.where(
            ph_tok, tk_ip,
            jnp.where(ph_lx | ph_mx, ex_ip, jnp.where(ph_mh, mh_ip, ip)))
        launches_lit = (ph_tok & tok_short) | lx_launch
        # one absolute source pointer: literal runs point at their input
        # bytes; a parsed match header points into output history (the
        # match length may still be pending in MLEXT — op cannot move in
        # between, so the pointer stays valid)
        srcptr = jnp.where(
            launches_lit, new_ip,
            jnp.where(ph_mh, OUTBASE + op - offset, srcptr))
        new_ip = jnp.where(launches_lit, new_ip + p_rem, new_ip)
        phase = jnp.where(
            ph_tok, tk_phase,
            jnp.where(lx_launch, PH_MATCHHDR,
                      jnp.where(ph_mh, mh_phase,
                                jnp.where(mx_launch, PH_TOKEN, phase))))
        pend_ml = jnp.where(ph_tok, t_ml, pend_ml)
        rem = jnp.where(parse, p_rem, rem)
        # a scheduled run longer than the whole output budget is malformed
        # on its own (clip would otherwise let op==0 + MAX_OUT pass)
        p_err = (ph_mh & mh_err) | (
            (new_ip > clen) & parse) | ((rem > MAX_OUT) & parse) | (
            (op + jnp.clip(rem, 0, MAX_OUT) > MAX_OUT) & parse)
        err = err | p_err.astype(I32)
        ip = jnp.where(parse, new_ip, ip)
        open_ = open_ & ~stall & ~(err > 0)

        # ---- emit one run slice into the register window (same engine as
        # snappy_pallas_w: two-register window, crossing continuation,
        # stay-in-place overlap acceleration)
        o = op & 127
        cwrow = op >> 7
        emit = open_ & (rem > 0) & active
        is_copy = emit & (srcptr >= OUTBASE)
        take = jnp.minimum(rem, 128 - o)
        second = cwrow > wrow0
        take = jnp.where(second, jnp.minimum(take, 127 - o), take)
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

        spos = q + lane - o
        v_far = gather2(La, Lb, (spos - (qr << 7)) & 255)
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
        srcptr = srcptr + jnp.where(take == avail, 0, take)
        crossed = ((op & 127) == 0) & (take > 0)
        crossed_b = jnp.broadcast_to(crossed[:, 0:1], (SUBG, LANES))
        tileB = jnp.where(crossed_b, tileA, tileB)
        tileA = jnp.where(crossed_b, zero, tileA)
        open_ = open_ & ~(second & ((op & 127) == 127) & (rem > 0))

        return (ip, op, rem, srcptr, phase, acc, pend_ml, err,
                tileA, tileB), open_

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
        for _ in range(K):
            for gi in range(G):
                sts[gi], open_ = token_step(gi, sts[gi], envs[gi])
                envs[gi][4] = open_

        # flush: tileB (the last COMPLETED row) at row op>>7 - 1
        out_states = []
        for gi in range(G):
            st = sts[gi]
            op, tileB = st[1], st[9]
            fr = (op >> 7) - 1
            scr_refs[gi][...] = fr
            for r in range(SUBG):
                c = gi * SUBG + r
                row = Rc + jnp.clip(scr_refs[gi][r, 0], 0, OUT_ROWSP - 1)
                uni_ref[pl.ds(c * RT + row, 1), :] = tileB[r : r + 1, :]
            out_states.append(st)
        return (steps + 1, tuple(out_states))

    init_states = tuple(
        (zero, zero, zero, zero, zero, zero, zero,
         err0_g[gi], zero, zero)
        for gi in range(G))

    def outer_body(c):
        return jax.lax.fori_loop(0, M, lambda _, cc: body(cc), c)

    steps, states = jax.lax.while_loop(
        cond, outer_body, (jnp.int32(0), init_states))

    for gi in range(G):
        op, rem, phase, err, tileA, tileB = (
            states[gi][1], states[gi][2], states[gi][4], states[gi][7],
            states[gi][8], states[gi][9])
        # final flush: ordered per-row stores, newest wins on clip collision
        fr = (op >> 7) - 1
        scr_refs[gi][...] = fr
        for r in range(SUBG):
            c = gi * SUBG + r
            row = Rc + jnp.clip(scr_refs[gi][r, 0], 0, OUT_ROWSP - 1)
            uni_ref[pl.ds(c * RT + row, 1), :] = tileB[r : r + 1, :]
            rowa = Rc + jnp.clip(scr_refs[gi][r, 0] + 1, 0, OUT_ROWSP - 1)
            uni_ref[pl.ds(c * RT + rowa, 1), :] = tileA[r : r + 1, :]
        # valid end: all input consumed, no run in flight, parked in
        # MATCHHDR (final literals-only sequence — last-literals rule)
        ok = (err == 0) & (rem == 0) & (phase == PH_MATCHHDR)
        meta_ref[pl.ds(gi * SUBG, SUBG), :] = jnp.where(
            lane == 0, op,
            jnp.where(lane == 1, ok.astype(I32),
                      jnp.where(lane == 2,
                                _rep(jnp.full((SUBG, 1), steps, I32)), 0)))


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
    """Decode B lz4 blocks (<=64KB decompressed each), unified-buffer
    group-interleaved, ONE kernel launch.

    NOTE: lz4 blocks carry no declared length; callers bound via out_cap.
    """
    assert out_cap <= MAX_OUT
    B, Lc = comp.shape
    pad_b = (-B) % SUB
    if pad_b:
        # minimal literals-only block: token 0x10 + 1 byte
        pad = jnp.zeros((pad_b, Lc), comp.dtype)
        pad = pad.at[:, 0].set(0x10)
        comp = jnp.concatenate([comp, pad], axis=0)
        comp_lens = jnp.concatenate(
            [comp_lens, jnp.full((pad_b,), 2, comp_lens.dtype)])
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
