"""Snappy block decode — window-fill multi-token Pallas TPU megakernel.

Format parity: reference snappy/SnappyRawDecompressor.java:30-220 (varint
length, tag dispatch, strict validation). Successor to ops/snappy_pallas8.py:
that kernel decodes ONE token per chunk per loop iteration (~7.2 output
bytes/token on the corpus), so a 64KB chunk costs ~9K iterations at a
~2.6-3.5µs iteration floor. Corpus measurement shows a 128-byte output
window holds ~18 tokens (p90 31), so this kernel restructures the loop as
ONE WINDOW PER ITERATION: an unrolled chain of K token steps that parses
and emits into the current 128-lane register tile until the window crosses,
then a single flush. Iterations drop from ~tokens to ~max(output/128,
far-token count/K) per chunk.

Per unrolled step (all uniform vector ops on (SUB, 128) i32 state):
- parse the next token's 5 header bytes from the iteration-entry input row
  pair (Ha/Hb, one split-gather; a step whose header would cross the pair
  STALLS the chunk until the next iteration — it reloads at the new ip);
- classify the source: literal-within-header-pair (served from Ha/Hb), near
  copy (dist <= o+128, served from the prev/tile register pair), or far
  (2 dynamic rows per chunk from in_ref for literals / out_ref for copies);
- per-lane 3-way select + split-gather places the bytes; a single masked
  merge into the tile. take <= dist caps self-overlap; a copy whose source
  range crosses into the register window selects those lanes from prev/tile
  (out_ref rows below wrow-1 are final: every iteration stores its tile).

Layout contract identical to snappy_pallas8 (input R=Rc rows, output
OUT_ROWSP rows per chunk, int32 per byte).
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
SUB = 32  # chunks per grid step
K = 18  # token steps per iteration (~p50 tokens per 128B window)
OUT_ROWS = 512  # 64KB output per chunk
PAD_ROWS = 8
OUT_ROWSP = OUT_ROWS + PAD_ROWS
MAX_OUT = OUT_ROWS * LANES


def _rep(x):
    return jnp.broadcast_to(x, (SUB, LANES))


def _decode_kernel(lens_ref, in_ref, out_ref, meta_ref):
    g = pl.program_id(0)
    Rc = in_ref.shape[0] // SUB
    lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    zero = jnp.zeros((SUB, LANES), I32)

    clen = _rep(
        jnp.stack([lens_ref[g * SUB + r] for r in range(SUB)]).reshape(SUB, 1))

    def gather2(row_a, row_b, idx):
        m = idx & 127
        return jnp.where(
            idx < 128,
            jnp.take_along_axis(row_a, m, axis=1),
            jnp.take_along_axis(row_b, m, axis=1),
        )

    # ---- varint uncompressed length (<=5 bytes), scalar per chunk
    decs, vlens = [], []
    for r in range(SUB):
        v = [in_ref[r * Rc, k] for k in range(5)]
        declared = v[0] & 0x7F
        vlen = jnp.int32(1)
        carry = v[0] >= 128
        for k in range(1, 5):
            declared = jnp.where(carry, declared | ((v[k] & 0x7F) << (7 * k)), declared)
            vlen = vlen + carry.astype(I32)
            if k < 4:
                carry = carry & (v[k] >= 128)
        decs.append(declared)
        vlens.append(vlen)
    declared = _rep(jnp.stack(decs).reshape(SUB, 1))
    vlen = _rep(jnp.stack(vlens).reshape(SUB, 1))
    err0 = ((declared > MAX_OUT) | (vlen > clen) | (clen > Rc * LANES)).astype(I32)

    # carry: ip, op, rem, src, from_inp, dist, err, steps, tile, prev
    def cond(c):
        ip, op, rem, err, steps = c[0], c[1], c[2], c[6], c[7]
        more = (rem[:, 0:1] > 0) | (ip[:, 0:1] < clen[:, 0:1])
        live = (err[:, 0:1] == 0) & more
        return (jnp.max(live.astype(I32)) > 0) & (steps < 2 * MAX_OUT)

    def body(c):
        ip, op, rem, src, from_inp, dist, err, steps, tile, prev = c
        wrow = op >> 7  # fixed for the whole iteration (crossing closes it)

        # ---- iteration-entry input row pair at ip
        hrow = ip >> 7
        ra, rb = [], []
        for r in range(SUB):
            h = hrow[r, 0]
            h0 = jnp.clip(h, 0, Rc - 1)
            h1 = jnp.clip(h + 1, 0, Rc - 1)
            ra.append(in_ref[pl.ds(r * Rc + h0, 1), :])
            rb.append(in_ref[pl.ds(r * Rc + h1, 1), :])
        Ha = jnp.concatenate(ra, axis=0)
        Hb = jnp.concatenate(rb, axis=0)
        hbase = hrow << 7

        open_ = jnp.ones((SUB, LANES), jnp.bool_)

        for _ in range(K):
            err_b = err > 0
            active = ~err_b & ((rem > 0) | (ip < clen)) & open_
            need = (rem == 0) & active
            # header must sit fully inside the entry row pair
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
            p_err = (
                (p_rem < 0)
                | (p_rem > MAX_OUT)
                | (ip + tok_size > clen)
                | (is_lit_tok & (ip + tok_size + jnp.clip(ext, 0, MAX_OUT) > clen))
                | (op + jnp.clip(p_rem, 0, MAX_OUT) > declared)
                | (~is_lit_tok) & ((cp_dist <= 0) | (cp_dist > op))
                | ((ttype == 3) & (b4 != 0))
            )

            rem = jnp.where(parse, p_rem, rem)
            src = jnp.where(parse, ip + tok_size, src)
            dist = jnp.where(
                parse, jnp.where(is_lit_tok, jnp.int32(MAX_OUT), cp_dist), dist)
            from_inp = jnp.where(parse, is_lit_tok.astype(I32), from_inp)
            ip = jnp.where(
                parse, ip + tok_size + jnp.where(is_lit_tok, ext, 0), ip)
            err = err | (parse & p_err).astype(I32)
            err_b = err > 0
            open_ = open_ & ~stall & ~err_b

            # ---- emit this step's run slice into the tile
            o = op & 127
            emit = open_ & (rem > 0) & active & ~err_b
            is_copy = emit & (from_inp == 0)
            is_lit = emit & (from_inp == 1)
            take = jnp.minimum(rem, 128 - o)
            take = jnp.where(is_copy, jnp.minimum(take, dist), take)
            take = jnp.where(emit, take, 0)

            q = jnp.where(is_lit, src, op - dist)
            q = jnp.where(emit, q, zero)
            # sources servable from the entry header pair (literals) or the
            # prev/tile register pair (near copies / range tails)
            lit_hdr = is_lit & (q >= hbase) & (q + take <= hbase + 2 * LANES)
            near_cp = is_copy & (dist <= o + LANES)
            needs_far = emit & ~lit_hdr & ~near_cp

            qr = q >> 7
            use_in = from_inp
            rows_a, rows_b = [], []
            for r in range(SUB):
                qq = qr[r, 0]
                ui = use_in[r, 0]
                qi0 = jnp.clip(qq, 0, Rc - 1)
                qi1 = jnp.clip(qq + 1, 0, Rc - 1)
                qo0 = jnp.clip(qq, 0, OUT_ROWS - 1)
                qo1 = jnp.clip(qq + 1, 0, OUT_ROWS - 1)
                ia = in_ref[pl.ds(r * Rc + qi0, 1), :]
                ib = in_ref[pl.ds(r * Rc + qi1, 1), :]
                oa = out_ref[pl.ds(r * OUT_ROWSP + qo0, 1), :]
                ob = out_ref[pl.ds(r * OUT_ROWSP + qo1, 1), :]
                rows_a.append(jnp.where(ui > 0, ia, oa))
                rows_b.append(jnp.where(ui > 0, ib, ob))
            La = jnp.concatenate(rows_a, axis=0)
            Lb = jnp.concatenate(rows_b, axis=0)

            spos = q + lane - o  # absolute source byte for output lane
            v_far = gather2(La, Lb, (spos - (qr << 7)) & 255)
            v_hdr = gather2(Ha, Hb, (spos - hbase) & 255)
            reg_base = (wrow - 1) << 7
            v_reg = gather2(prev, tile, (spos - reg_base) & 255)

            lit_hdr_b = jnp.broadcast_to(lit_hdr[:, 0:1], (SUB, LANES))
            # per-lane: copy lanes whose source reaches the register window
            # come from prev/tile even on a "far" copy
            in_reg = spos >= reg_base
            is_copy_b = jnp.broadcast_to(is_copy[:, 0:1], (SUB, LANES))
            value = jnp.where(
                lit_hdr_b, v_hdr,
                jnp.where(is_copy_b & in_reg, v_reg, v_far))

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

        # ---- flush: store the tile at the iteration's window row
        for r in range(SUB):
            row = jnp.minimum(wrow[r, 0], OUT_ROWSP - 1)
            out_ref[pl.ds(r * OUT_ROWSP + row, 1), :] = tile[r : r + 1, :]

        crossed_it = (op >> 7) > wrow
        prev = jnp.where(crossed_it, tile, prev)
        tile = jnp.where(crossed_it, zero, tile)
        return (ip, op, rem, src, from_inp, dist, err, steps + 1, tile, prev)

    init = (vlen, zero, zero, zero, zero, zero, err0,
            jnp.int32(0), zero, zero)
    out = jax.lax.while_loop(cond, body, init)
    ip, op, rem, err, steps, tile = out[0], out[1], out[2], out[6], out[7], out[8]

    ok = (err == 0) & (op == declared) & (rem == 0)
    meta_ref[:, :] = jnp.where(
        lane == 0, op,
        jnp.where(lane == 1, ok.astype(I32),
                  jnp.where(lane == 2, _rep(jnp.full((SUB, 1), steps, I32)), 0)))


@partial(jax.jit, static_argnames=("interpret",))
def _decode_impl(comp, comp_lens, interpret: bool):
    B, Lc = comp.shape
    Rc = Lc // LANES
    rows = comp.astype(I32).reshape(B * Rc, LANES)
    G = B // SUB
    out_rows, meta = pl.pallas_call(
        _decode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((SUB * Rc, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SUB * OUT_ROWSP, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * OUT_ROWSP, LANES), I32),
            jax.ShapeDtypeStruct((B, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(comp_lens.astype(I32), rows)
    out_lens = meta[:, 0]
    ok = meta[:, 1] > 0
    steps = meta[:, 2]
    out = out_rows.reshape(B, OUT_ROWSP * LANES)[:, :MAX_OUT]
    j = jnp.arange(MAX_OUT, dtype=I32)[None, :]
    out = jnp.where(j < out_lens[:, None], out, 0).astype(jnp.uint8)
    return out, out_lens, ok, steps


def decode(comp, comp_lens, out_cap: int = MAX_OUT, with_steps: bool = False):
    """Decode B snappy blocks (<=64KB decompressed each), one 128-byte output
    window per loop iteration, ONE kernel launch. Same contract as
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
