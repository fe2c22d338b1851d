"""Snappy block decode — unified-buffer, group-interleaved Pallas megakernel.

Format parity: reference snappy/SnappyRawDecompressor.java:30-220 (varint
length, tag dispatch, strict validation). Successor to the r2 single-token kernel (snappy_pallas8).
Two measured facts drive the design (amortized timing; the device tunnel
costs ~25ms per program round-trip and inflated every small single-call
measurement):

1. The per-token work is SCALAR-UNIT-bound on far row loads. Fix: ONE
   address space — each chunk's VMEM block holds [input rows | output
   rows], staged once per grid step, so a token's source (literal bytes
   from the input region or match bytes from the output history) is ONE
   (2,128) dynamic slice instead of four loads + selects.
2. The vector parse/emit chain is LATENCY-bound: a microbench shows 8
   independent op streams cost the same as 1 (the VPU issues multiple
   vregs/cycle; a single dependency chain runs at ~6ns/op). Fix: split
   the SUB chunks into G independent GROUPS and interleave their token
   steps, giving the scheduler G dependency chains to overlap.

Per token step each chunk costs the scalar unit 1 extract + 1 clip +
1 two-row slice; the 128-byte register window (`tile`) serves
self-overlapping lanes (rows below the window are final in memory
because every iteration stores its tile). Iterations fill one window
per chunk via K unrolled token steps (window-fill).

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
SUBG = 8  # chunks per group (sublanes of one vreg)
G = 8  # interleaved independent groups
SUB = SUBG * G  # chunks per grid step
K = 8  # token steps per iteration (best measured vs 4/6/12/18)
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

    # per-group carry: ip, op, rem, src, from_inp, dist, err, tile
    def cond(c):
        steps = c[0]
        live = jnp.int32(0)
        for gi in range(G):
            ip, op, rem, err = c[1][gi][0], c[1][gi][1], c[1][gi][2], c[1][gi][6]
            more = (rem[:, 0:1] > 0) | (ip[:, 0:1] < clen_g[gi][:, 0:1])
            live = live + jnp.max(((err[:, 0:1] == 0) & more).astype(I32))
        return (live > 0) & (steps < 2 * MAX_OUT)

    def hdr_load(gi, hrow):
        # one vector store + SUBG scalar loads instead of SUBG
        # vector->scalar extracts (each extract is a pipeline sync).
        # 2-row header pair: a token whose 5 header bytes cross the pair
        # stalls; the next iteration's reload realigns, so every token
        # eventually parses (a single-row header would stall forever on a
        # row-crossing token).
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
        ip, op, rem, src, from_inp, dist, err, tile = st
        Ha, Hb, hbase, wrow, open_ = env
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
        src = jnp.where(parse, ip + tok_size, src)
        dist = jnp.where(
            parse, jnp.where(is_lit_tok, jnp.int32(MAX_OUT), cp_dist), dist)
        from_inp = jnp.where(parse, is_lit_tok.astype(I32), from_inp)
        ip = jnp.where(
            parse, ip + tok_size + jnp.where(is_lit_tok, ext, 0), ip)
        err = err | (parse & p_err).astype(I32)
        open_ = open_ & ~stall & ~(err > 0)

        # ---- emit this step's run slice into the tile
        o = op & 127
        emit = open_ & (rem > 0) & active
        is_copy = emit & (from_inp == 0)
        take = jnp.minimum(rem, 128 - o)
        take = jnp.where(is_copy, jnp.minimum(take, dist), take)
        take = jnp.where(emit, take, 0)

        # unified source position: literal bytes from the input region,
        # match bytes from the output history region
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

        spos = q + lane - o  # absolute unified source byte per lane
        v_far = gather2(La, Lb, (spos - (qr << 7)) & 255)
        # lanes whose source falls inside the in-flight register window
        is_copy_b = jnp.broadcast_to(is_copy[:, 0:1], (SUBG, LANES))
        in_tile = is_copy_b & (spos >= OUTBASE + (wrow << 7))
        v_tile = jnp.take_along_axis(tile, spos & 127, axis=1)
        value = jnp.where(in_tile, v_tile, v_far)

        mask = (lane >= o) & (lane < o + take)
        tile = jnp.where(mask, value, tile)
        op = op + take
        rem = rem - take
        src = src + take
        # overlap-run growth (RLE): after a full-dist take the copied
        # region itself becomes valid source
        dist = jnp.where(
            is_copy & (take == dist) & (rem > 0),
            jnp.minimum(dist * 2, MAX_OUT), dist)
        crossed = ((op & 127) == 0) & (take > 0)
        open_ = open_ & ~crossed

        return (ip, op, rem, src, from_inp, dist, err, tile), open_

    def body(c):
        steps, states = c
        envs = []
        for gi in range(G):
            ip, op = states[gi][0], states[gi][1]
            wrow = op >> 7  # fixed for the whole iteration
            hrow = ip >> 7
            Ha, Hb = hdr_load(gi, hrow)
            hbase = jnp.maximum(jnp.minimum(hrow, Rc - 2), 0) << 7
            open_ = jnp.ones((SUBG, LANES), jnp.bool_)
            envs.append([Ha, Hb, hbase, wrow, open_])
        sts = list(states)
        # interleave: step each group once, round-robin, K times — the G
        # chains are data-independent so the scheduler overlaps them
        for _ in range(K):
            for gi in range(G):
                sts[gi], open_ = token_step(gi, sts[gi], envs[gi])
                envs[gi][4] = open_

        # ---- flush: store each group's tile at its window row
        out_states = []
        for gi in range(G):
            ip, op, rem, src, from_inp, dist, err, tile = sts[gi]
            wrow = envs[gi][3]
            scr_refs[gi][...] = wrow
            for r in range(SUBG):
                c = gi * SUBG + r
                row = Rc + jnp.minimum(scr_refs[gi][r, 0], OUT_ROWSP - 1)
                uni_ref[pl.ds(c * RT + row, 1), :] = tile[r : r + 1, :]
            crossed_it = (op >> 7) > wrow
            tile = jnp.where(crossed_it, zero, tile)
            out_states.append((ip, op, rem, src, from_inp, dist, err, tile))
        return (steps + 1, tuple(out_states))

    init_states = tuple(
        (vlen_g[gi], zero, zero, zero, zero, zero, err0_g[gi], zero)
        for gi in range(G))
    # The cond's live-reduction is a vector->scalar sync that drains the
    # whole VPU pipeline (~15x the marginal iteration cost, measured).
    # Evaluate it only every M iterations; overrun iterations are
    # branchless no-ops for finished chunks.
    M = 16

    def outer_body(c):
        return jax.lax.fori_loop(0, M, lambda _, cc: body(cc), c)

    steps, states = jax.lax.while_loop(
        cond, outer_body, (jnp.int32(0), init_states))

    for gi in range(G):
        ip, op, rem, err = states[gi][0], states[gi][1], states[gi][2], states[gi][6]
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
    group-interleaved window-fill, ONE kernel launch. Same contract as
    snappy_pallas8.decode."""
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
