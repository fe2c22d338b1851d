"""LZO1X block decode — unified-buffer, group-interleaved Pallas megakernel.

Format parity: reference lzo/LzoRawDecompressor.java:72-345 (five command
families M1/M1'/M2/M3/M4, zero-extension lengths, trailing-literal state
machine, mandatory stop command — see lzo/block_ref.py for the own host
tier this kernel is differentially tested against).

Same architecture as ops/snappy_pallas_w.py (unified [input|output] VMEM
address space per chunk, G independent interleaved chunk groups for VPU
ILP, termination checks amortized over M iterations, scratch-column
scalar extracts) over LZO's phase machine (r2 baseline: scratch/lzo_pallas_r2.py):

  0 TOKEN   dispatch on (t, state); zero-extended lengths enter LENEXT
  1 LENEXT  consume <=4 zero-extension bytes per step
  2 DIST    the LE16 distance word of a length-extended M3/M4
  3 TRAIL   launch the 0..3 trailing literals after every copy
  4 DONE    terminal — entered by the M4 stop command

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
SUBG = 8
G = 8
SUB = SUBG * G
K = 8
OUT_ROWS = 512
PAD_ROWS = 8
OUT_ROWSP = OUT_ROWS + PAD_ROWS
MAX_OUT = OUT_ROWS * LANES

PH_TOKEN, PH_LENEXT, PH_DIST, PH_TRAIL, PH_DONE = 0, 1, 2, 3, 4
K_STAND, K_M3, K_M4 = 0, 1, 2
FROM_COPY, FROM_LIT = 0, 1


def _rep(x):
    return jnp.broadcast_to(x, (SUBG, LANES))


def _decode_kernel(lens_ref, in_ref, uni_ref, meta_ref, *scr_refs):
    g0 = pl.program_id(0)
    Rc = in_ref.shape[0] // SUB
    RT = Rc + OUT_ROWSP
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

    # per-group constants + first-byte special (reference: stream starting
    # with t > 17 is a literal run of t-17 bytes)
    clen_g, init_g = [], []
    for gi in range(G):
        clen = _rep(jnp.stack(
            [lens_ref[g0 * SUB + gi * SUBG + r] for r in range(SUBG)]
        ).reshape(SUBG, 1))
        clen_g.append(clen)
        t0 = _rep(jnp.stack(
            [in_ref[(gi * SUBG + r) * Rc, 0] for r in range(SUBG)]
        ).reshape(SUBG, 1))
        first_lit = t0 > 17
        rem0 = jnp.where(first_lit, t0 - 17, 0)
        ip0 = jnp.where(first_lit, 1 + rem0, jnp.int32(0))
        src0 = jnp.where(first_lit, 1, 0)
        from0 = jnp.where(first_lit, FROM_LIT, FROM_COPY)
        state0 = jnp.where(first_lit, jnp.minimum(rem0, 4), 0)
        err0 = ((clen <= 0) | (clen > Rc * LANES)
                | (first_lit & (ip0 > clen))).astype(I32)
        init_g.append((ip0, zero, rem0, src0, from0, zero, zero, state0,
                       zero, zero, zero, zero, err0, zero, zero))

    # per-group carry: ip, op, rem, src, from_inp, dist, phase, state, acc,
    #                  kind, pflag, pend_tr, err, tileA, tileB
    def cond(c):
        steps = c[0]
        live = jnp.int32(0)
        for gi in range(G):
            st = c[1][gi]
            ip, rem, phase, err = st[0], st[2], st[6], st[12]
            more = (rem[:, 0:1] > 0) | (
                (ip[:, 0:1] < clen_g[gi][:, 0:1]) & (phase[:, 0:1] != PH_DONE))
            live = live + jnp.max(((err[:, 0:1] == 0) & more).astype(I32))
        return (live > 0) & (steps < 2 * MAX_OUT)

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
        (ip, op, rem, src, from_inp, dist, phase, state, acc, kind,
         pflag, pend_tr, err, tileA, tileB) = st
        Ha, Hb, hbase, wrow0, open_ = env
        clen = clen_g[gi]

        active = (err == 0) & (
            (rem > 0) | ((ip < clen) & (phase != PH_DONE))) & open_
        need = (rem == 0) & active & (phase != PH_DONE)
        stall = need & (ip + 4 > hbase + 2 * LANES)
        parse = need & ~stall

        hs = ip - hbase
        pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 3))
        b0 = _rep(pk[:, 0:1])
        b1 = _rep(pk[:, 1:2])
        b2 = _rep(pk[:, 2:3])
        b3 = _rep(pk[:, 3:4])

        # ---- phase TOKEN dispatch
        t = b0
        stand = (t < 16) & (state == 0)
        m1 = (t < 16) & (state >= 1) & (state <= 3)
        m1p = (t < 16) & (state >= 4)
        m4 = (t >= 16) & (t < 32)
        m3 = (t >= 32) & (t < 64)
        m2 = t >= 64

        stand_ext = stand & (t == 0)
        le16 = b1 | (b2 << 8)
        m4_len7 = t & 7
        m3_len31 = t & 31
        m4_ext = m4 & (m4_len7 == 0)
        m3_ext = m3 & (m3_len31 == 0)
        goes_ext = stand_ext | m4_ext | m3_ext

        cp_len = jnp.where(
            m1, 2,
            jnp.where(m1p, 3,
                      jnp.where(m2, (t >> 5) + 1,
                                jnp.where(m4, m4_len7 + 2, m3_len31 + 2))))
        cp_dist = jnp.where(
            m1, (t >> 2) + (b1 << 2) + 1,
            jnp.where(m1p, (t >> 2) + (b1 << 2) + 2049,
                      jnp.where(m2, ((t >> 2) & 7) + (b1 << 3) + 1,
                                jnp.where(m4, 16384 + ((t & 8) << 11) + (le16 >> 2),
                                          (le16 >> 2) + 1))))
        cp_tr = jnp.where(m3 | m4, le16 & 3, t & 3)
        tok_size = jnp.where(stand | goes_ext, 1,
                             jnp.where(m3 | m4, 3, 2))
        is_stop = m4 & ~m4_ext & (cp_dist == 16384)

        tk_lit_launch = stand & ~stand_ext
        tk_cpy_launch = (m1 | m1p | m2 | (m4 & ~m4_ext & ~is_stop)
                         | (m3 & ~m3_ext))
        tk_rem = jnp.where(tk_lit_launch, t + 3,
                           jnp.where(tk_cpy_launch, cp_len, 0))
        tk_acc = jnp.where(stand_ext, 18, jnp.where(m4_ext, 9, 33))
        tk_kind = jnp.where(stand_ext, K_STAND, jnp.where(m4_ext, K_M4, K_M3))
        tk_phase = jnp.where(
            is_stop, PH_DONE,
            jnp.where(goes_ext, PH_LENEXT,
                      jnp.where(tk_cpy_launch, PH_TRAIL, PH_TOKEN)))
        tk_ip = ip + tok_size

        # ---- phase LENEXT
        z0 = (b0 == 0).astype(I32)
        z1 = z0 * (b1 == 0).astype(I32)
        z2 = z1 * (b2 == 0).astype(I32)
        z3 = z2 * (b3 == 0).astype(I32)
        kz = z0 + z1 + z2 + z3
        term = jnp.where(
            kz == 0, b0, jnp.where(kz == 1, b1, jnp.where(
                kz == 2, b2, jnp.where(kz == 3, b3, 0))))
        ext_done = kz < 4
        ex_acc = acc + 255 * kz + jnp.where(ext_done, term, 0)
        ex_ip = ip + kz + jnp.where(ext_done, 1, 0)

        # ---- phase DIST
        d_le16 = b0 | (b1 << 8)
        d_dist = jnp.where(
            kind == K_M4, 16384 + (pflag << 14) + (d_le16 >> 2),
            (d_le16 >> 2) + 1)
        d_stop = (kind == K_M4) & (d_dist == 16384)
        d_tr = d_le16 & 3
        d_ip = ip + 2

        # ---- merge by phase
        ph_tok = parse & (phase == PH_TOKEN)
        ph_lx = parse & (phase == PH_LENEXT)
        ph_ds = parse & (phase == PH_DIST)
        ph_tr = parse & (phase == PH_TRAIL)

        lx_fin = ph_lx & ext_done
        lx_lit = lx_fin & (kind == K_STAND)
        lx_dist = lx_fin & (kind != K_STAND)

        launches_lit = (ph_tok & tk_lit_launch) | lx_lit | (ph_tr & (pend_tr > 0))
        launches_cpy = (ph_tok & tk_cpy_launch) | (ph_ds & ~d_stop)

        p_rem = jnp.where(
            ph_tok, tk_rem,
            jnp.where(lx_lit, ex_acc,
                      jnp.where(ph_ds & ~d_stop, acc,
                                jnp.where(ph_tr, pend_tr, 0))))
        new_ip = jnp.where(
            ph_tok, tk_ip,
            jnp.where(ph_lx, ex_ip, jnp.where(ph_ds, d_ip, ip)))
        n_src = jnp.where(launches_lit, new_ip, src)
        new_ip = jnp.where(launches_lit, new_ip + p_rem, new_ip)
        n_from = jnp.where(launches_lit, FROM_LIT,
                           jnp.where(launches_cpy, FROM_COPY, from_inp))
        n_dist = jnp.where(ph_tok & tk_cpy_launch, cp_dist,
                           jnp.where(ph_ds & ~d_stop, d_dist, dist))
        n_phase = jnp.where(
            ph_tok, tk_phase,
            jnp.where(lx_lit, PH_TOKEN,
                      jnp.where(lx_dist, PH_DIST,
                                jnp.where(ph_ds, jnp.where(d_stop, PH_DONE, PH_TRAIL),
                                          jnp.where(ph_tr, PH_TOKEN, phase)))))
        n_acc = jnp.where(ph_tok, tk_acc, jnp.where(ph_lx, ex_acc, acc))
        n_kind = jnp.where(ph_tok, tk_kind, kind)
        n_pflag = jnp.where(ph_tok, (t & 8) >> 3, pflag)
        n_pend = jnp.where(ph_tok & tk_cpy_launch, cp_tr,
                           jnp.where(ph_ds & ~d_stop, d_tr, pend_tr))
        n_state = jnp.where(
            (ph_tok & tk_lit_launch) | lx_lit, 4,
            jnp.where(ph_tr, pend_tr, state))
        new_ip = jnp.where(
            (ph_tok & is_stop) | (ph_ds & d_stop), clen, new_ip)

        rem = jnp.where(parse, p_rem, rem)
        tok_over = (ph_tok & (tk_ip > clen)) | (ph_ds & (d_ip > clen))
        p_err = tok_over | (parse & (new_ip > clen)) | (
            launches_cpy & ((n_dist <= 0) | (n_dist > op))) | (
            parse & (rem > MAX_OUT)) | (
            parse & (op + jnp.clip(rem, 0, MAX_OUT) > MAX_OUT))
        err = err | p_err.astype(I32)
        src = jnp.where(parse, n_src, src)
        from_inp = jnp.where(parse, n_from, from_inp)
        dist = jnp.where(parse, n_dist, dist)
        ip = jnp.where(parse, new_ip, ip)
        phase = jnp.where(parse, n_phase, phase)
        state = jnp.where(parse, n_state, state)
        acc = jnp.where(parse, n_acc, acc)
        kind = jnp.where(parse, n_kind, kind)
        pflag = jnp.where(parse, n_pflag, pflag)
        pend_tr = jnp.where(parse, n_pend, pend_tr)
        open_ = open_ & ~stall & ~(err > 0)

        # ---- emit (shared r4 engine: two-register window with crossing
        # continuation, see ops/snappy_pallas_w.py)
        o = op & 127
        cwrow = op >> 7
        emit = open_ & (rem > 0) & active
        is_copy = emit & (from_inp == FROM_COPY)
        take = jnp.minimum(rem, 128 - o)
        second = cwrow > wrow0
        take = jnp.where(second, jnp.minimum(take, 127 - o), take)
        take = jnp.where(is_copy, jnp.minimum(take, dist), take)
        take = jnp.where(emit, take, 0)

        q = jnp.where(is_copy, OUTBASE + op - dist, src)
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
        src = src + take
        dist = jnp.where(
            is_copy & (take == dist) & (rem > 0),
            jnp.minimum(dist * 2, MAX_OUT), dist)
        crossed = ((op & 127) == 0) & (take > 0)
        crossed_b = jnp.broadcast_to(crossed[:, 0:1], (SUBG, LANES))
        tileB = jnp.where(crossed_b, tileA, tileB)
        tileA = jnp.where(crossed_b, zero, tileA)
        open_ = open_ & ~(second & ((op & 127) == 127) & (rem > 0))

        return (ip, op, rem, src, from_inp, dist, phase, state, acc, kind,
                pflag, pend_tr, err, tileA, tileB), open_

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
            op, tileB = st[1], st[14]
            fr = (op >> 7) - 1
            scr_refs[gi][...] = fr
            for r in range(SUBG):
                c = gi * SUBG + r
                row = Rc + jnp.clip(scr_refs[gi][r, 0], 0, OUT_ROWSP - 1)
                uni_ref[pl.ds(c * RT + row, 1), :] = tileB[r : r + 1, :]
            out_states.append(st)
        return (steps + 1, tuple(out_states))

    M = 16

    def outer_body(c):
        return jax.lax.fori_loop(0, M, lambda _, cc: body(cc), c)

    steps, states = jax.lax.while_loop(
        cond, outer_body, (jnp.int32(0), tuple(init_g)))

    for gi in range(G):
        op, rem, phase, err, tileA, tileB = (
            states[gi][1], states[gi][2], states[gi][6], states[gi][12],
            states[gi][13], states[gi][14])
        # final flush: ordered per-row stores, newest wins on clip collision
        fr = (op >> 7) - 1
        scr_refs[gi][...] = fr
        for r in range(SUBG):
            c = gi * SUBG + r
            row = Rc + jnp.clip(scr_refs[gi][r, 0], 0, OUT_ROWSP - 1)
            uni_ref[pl.ds(c * RT + row, 1), :] = tileB[r : r + 1, :]
            rowa = Rc + jnp.clip(scr_refs[gi][r, 0] + 1, 0, OUT_ROWSP - 1)
            uni_ref[pl.ds(c * RT + rowa, 1), :] = tileA[r : r + 1, :]
        # valid end: the M4 stop command was seen (phase DONE) with no run
        # in flight (reference: "missing stop command" otherwise)
        ok = (err == 0) & (rem == 0) & (phase == PH_DONE)
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
    """Decode B LZO1X blocks (<=64KB decompressed each), unified-buffer
    group-interleaved, ONE kernel launch."""
    assert out_cap <= MAX_OUT
    B, Lc = comp.shape
    pad_b = (-B) % SUB
    if pad_b:
        # minimal valid stream: 0x11 0x00 0x00 (M4 stop)
        stop = np.zeros((pad_b, Lc), np.uint8)
        stop[:, 0] = 0x11
        comp = jnp.concatenate([comp, jnp.asarray(stop)], axis=0)
        comp_lens = jnp.concatenate(
            [comp_lens, jnp.full((pad_b,), 3, comp_lens.dtype)])
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
