"""LZ4 block decode — sublane-batched Pallas TPU megakernel (SUB-way).

Format parity: reference lz4/Lz4RawDecompressor.java:35-198 (token = 4-bit
literal length | 4-bit match length, 255-extension bytes, 2-byte LE offset,
strict bounds). Same vectorized SUB-chunks-per-grid-step architecture as
ops/snappy_pallas8.py (see its docstring for the cost model); the
difference is the parse machine: LZ4 tokens drive a literal run AND a match
run per sequence, with unbounded 255-extension byte strings, so each chunk
carries a PHASE:

  0 TOKEN     parse token byte; short literal runs launch immediately
  1 LITEXT    consume ≤4 literal-length extension bytes per iteration
  2 MATCHHDR  parse the 2-byte offset (or detect end-of-input after
              the final literals-only sequence)
  3 MLEXT     consume ≤4 match-length extension bytes per iteration

plus the run-in-flight state shared with snappy (rem/src/from/dist): a
typical sequence costs TWO iterations (token+literal window, then
offset+match window). All phase dispatch is uniform vector select — only
the per-chunk row loads/stores are scalar-addressed.
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
SUB = 32
OUT_ROWS = 512  # 64KB output per chunk
# 8 pad rows per chunk: the per-iteration tile store is UNCONDITIONAL (a
# per-chunk pl.when flush-on-crossing costs ~43ns/branch, measured on the
# snappy kernel; an unconditional store ~3.6ns) and needs a harmless
# landing row once a chunk is done (op == 64KB -> row 512). Safe: far
# copies only SELECT bytes strictly below the current output row.
PAD_ROWS = 8
OUT_ROWSP = OUT_ROWS + PAD_ROWS
MAX_OUT = OUT_ROWS * LANES

PH_TOKEN, PH_LITEXT, PH_MATCHHDR, PH_MLEXT = 0, 1, 2, 3
FROM_COPY, FROM_LIT = 0, 1


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

    def in_rows(ip):
        ra, rb = [], []
        for r in range(SUB):
            h = ip[r, 0] >> 7
            h0 = jnp.clip(h, 0, Rc - 1)
            h1 = jnp.clip(h + 1, 0, Rc - 1)
            ra.append(in_ref[pl.ds(r * Rc + h0, 1), :])
            rb.append(in_ref[pl.ds(r * Rc + h1, 1), :])
        return jnp.concatenate(ra, axis=0), jnp.concatenate(rb, axis=0)

    err0 = (clen <= 0) | (clen > Rc * LANES)

    # carry: ip, op, rem, src, from_inp, dist, phase, acc, pend_ml, err,
    #        steps, tile, prev   (err as i32 — bool carries fail Mosaic)
    def cond(c):
        ip, op, rem, err, steps = c[0], c[1], c[2], c[9], c[10]
        more = (rem[:, 0:1] > 0) | (ip[:, 0:1] < clen[:, 0:1])
        live = (err[:, 0:1] == 0) & more
        return (jnp.max(live.astype(I32)) > 0) & (steps < 3 * MAX_OUT)

    def body(c):
        (ip, op, rem, src, from_inp, dist, phase, acc, pend_ml,
         err, steps, tile, prev) = c
        active = (err == 0) & ((rem > 0) | (ip < clen))
        need = (rem == 0) & active

        # ---- 5 header bytes at ip
        Ha, Hb = in_rows(ip)
        hs = ip & 127
        pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 5))
        b0 = _rep(pk[:, 0:1])
        b1 = _rep(pk[:, 1:2])
        b2 = _rep(pk[:, 2:3])
        b3 = _rep(pk[:, 3:4])

        # ---- phase TOKEN
        t_lit = b0 >> 4
        t_ml = b0 & 15
        tok_short = t_lit < 15
        # short literal count launches the run now; 15 enters LITEXT
        tk_rem = jnp.where(tok_short, t_lit, 0)
        tk_phase = jnp.where(tok_short, PH_MATCHHDR, PH_LITEXT)
        tk_ip = ip + 1
        tk_acc = jnp.full_like(acc, 15)

        # ---- phases LITEXT / MLEXT: swallow ≤4 extension bytes
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

        # ---- phase MATCHHDR. A stream that runs out of input parked in
        # MATCHHDR ended with its final literals (the only valid ending —
        # reference last-literals rule, Lz4RawDecompressor.java:168-171);
        # the while cond exits before this phase ever executes at ip==clen.
        offset = b0 | (b1 << 8)
        mh_short = pend_ml < 15
        mh_rem = jnp.where(mh_short, pend_ml + 4, 0)
        mh_phase = jnp.where(mh_short, PH_TOKEN, PH_MLEXT)
        mh_ip = ip + 2
        mh_err = (offset <= 0) | (offset > op)

        # ---- merge parse results by phase
        ph_tok = need & (phase == PH_TOKEN)
        ph_lx = need & (phase == PH_LITEXT)
        ph_mh = need & (phase == PH_MATCHHDR)
        ph_mx = need & (phase == PH_MLEXT)

        n_acc = jnp.where(
            ph_tok | (ph_mh & ~mh_short), tk_acc,
            jnp.where(ph_lx | ph_mx, ex_acc, acc))
        # LITEXT completion launches the literal run; MLEXT the match run
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
        # literal runs read input at the position AFTER their header/exts
        launches_lit = (ph_tok & tok_short) | lx_launch
        launches_cpy = (ph_mh & (mh_rem > 0)) | mx_launch
        n_src = jnp.where(launches_lit, new_ip, src)
        # skip the literal bytes in the input stream
        new_ip = jnp.where(launches_lit, new_ip + p_rem, new_ip)
        n_from = jnp.where(launches_lit, FROM_LIT,
                           jnp.where(launches_cpy, FROM_COPY, from_inp))
        n_dist = jnp.where(ph_mh, offset, dist)
        n_phase = jnp.where(
            ph_tok, tk_phase,
            jnp.where(lx_launch, PH_MATCHHDR,
                      jnp.where(ph_mh, mh_phase,
                                jnp.where(mx_launch, PH_TOKEN, phase))))
        n_pend = jnp.where(ph_tok, t_ml, pend_ml)
        m_rem = jnp.where(need, p_rem, rem)
        # a finished stream parks ip at clen with rem 0
        # a scheduled run longer than the whole output budget is malformed
        # on its own (clip would otherwise let op==0 + MAX_OUT pass the
        # bound check and the store row run past this chunk's pad rows)
        p_err = (ph_mh & mh_err) | (
            (new_ip > clen) & need) | ((m_rem > MAX_OUT) & need) | (
            (op + jnp.clip(m_rem, 0, MAX_OUT) > MAX_OUT) & need)
        n_err = err | p_err.astype(I32)
        n_err_b = n_err > 0
        m_src = jnp.where(need, n_src, src)
        m_from = jnp.where(need, n_from, from_inp)
        m_dist = jnp.where(need, n_dist, dist)
        m_ip = jnp.where(need, new_ip, ip)

        # ---- emit one ≤128-byte window (shared with the snappy kernel)
        o = op & 127
        is_copy = (m_from == FROM_COPY) & active & (m_rem > 0)
        is_lit = (m_from == FROM_LIT) & active & (m_rem > 0)
        take = jnp.minimum(m_rem, 128 - o)
        take = jnp.where(is_copy, jnp.minimum(take, m_dist), take)
        take = jnp.where(n_err_b | ~active, 0, take)

        near = is_copy & (m_dist <= o + 127)
        idx_near = (o + 128 - m_dist) + lane - o
        q_all = jnp.where(is_lit, m_src, op - m_dist)
        q_all = jnp.where(is_lit | is_copy, q_all, zero)
        from_in = is_lit.astype(I32)
        rows_a, rows_b = [], []
        for r in range(SUB):
            q = q_all[r, 0] >> 7
            use_in = from_in[r, 0]
            qi0 = jnp.clip(q, 0, Rc - 1)
            qi1 = jnp.clip(q + 1, 0, Rc - 1)
            qo0 = jnp.clip(q, 0, OUT_ROWS - 1)
            qo1 = jnp.clip(q + 1, 0, OUT_ROWS - 1)
            ia = in_ref[pl.ds(r * Rc + qi0, 1), :]
            ib = in_ref[pl.ds(r * Rc + qi1, 1), :]
            oa = out_ref[pl.ds(r * OUT_ROWSP + qo0, 1), :]
            ob = out_ref[pl.ds(r * OUT_ROWSP + qo1, 1), :]
            rows_a.append(jnp.where(use_in > 0, ia, oa))
            rows_b.append(jnp.where(use_in > 0, ib, ob))
        La = jnp.concatenate(rows_a, axis=0)
        Lb = jnp.concatenate(rows_b, axis=0)
        idx_far = (q_all & 127) + lane - o

        near_b = jnp.broadcast_to(near[:, 0:1], (SUB, LANES))
        src_a = jnp.where(near_b, prev, La)
        src_b = jnp.where(near_b, tile, Lb)
        idx = jnp.where(near_b, idx_near, idx_far)
        placed = gather2(src_a, src_b, idx & 255)

        mask = (lane >= o) & (lane < o + take)
        n_tile = jnp.where(mask, placed, tile)
        n_op = op + take
        crossed = ((n_op & 127) == 0) & (take > 0)

        # unconditional flush (see PAD_ROWS note): on a crossing iteration
        # this is the row's final value; otherwise a partial write no
        # reader selects
        for r in range(SUB):
            row = jnp.minimum(op[r, 0] >> 7, OUT_ROWSP - 1)
            out_ref[pl.ds(r * OUT_ROWSP + row, 1), :] = n_tile[r : r + 1, :]

        n_prev = jnp.where(crossed, n_tile, prev)
        n_tile = jnp.where(crossed, zero, n_tile)
        n_dist2 = jnp.where(
            is_copy & (take == m_dist), jnp.minimum(m_dist * 2, MAX_OUT), m_dist)
        n_err = n_err | ((take <= 0) & (m_rem > 0) & active).astype(I32)
        return (
            m_ip, n_op, m_rem - take, m_src + take, m_from, n_dist2,
            n_phase, n_acc, n_pend, n_err, steps + 1, n_tile, n_prev,
        )

    init = (zero, zero, zero, zero, zero, zero, zero, zero, zero,
            err0.astype(I32), jnp.int32(0), zero, zero)
    out = jax.lax.while_loop(cond, body, init)
    op, rem, phase, err, steps, tile = (
        out[1], out[2], out[6], out[9], out[10], out[11])

    # (no final flush needed: every body iteration stores every chunk's
    # in-progress tile, so the last iteration left all rows final)
    # valid end: all input consumed, no run in flight, parked in MATCHHDR —
    # i.e. the stream ended with its final literals-only sequence (a stream
    # ending on a match is malformed, reference last-literals rule)
    ok = (err == 0) & (rem == 0) & (phase == PH_MATCHHDR)
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
    """Decode B lz4 blocks (≤64KB decompressed each), SUB chunks per grid
    step, ONE kernel launch. comp (B, Lc) uint8 zero-padded; comp_lens (B,).
    Returns (out (B, out_cap) uint8, out_lens (B,), ok (B,) bool).

    NOTE: lz4 blocks carry no declared length; callers bound via out_cap.
    """
    assert out_cap <= MAX_OUT
    B, Lc = comp.shape
    pad_b = (-B) % SUB
    if pad_b:
        # a 1-byte block 0x00 = token(0 literals, match part unused) is NOT
        # valid lz4; use a minimal literals-only block: token 0x10 + 1 byte
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
    # codec-independent backstop: a length past the returned buffer can
    # never be "ok" (the kernel errs on oversized runs, but keep the
    # wrapper self-contained)
    ok = ok & (out_lens <= MAX_OUT)
    if out_cap != MAX_OUT:
        out = out[:, :out_cap]
        ok = ok & (out_lens <= out_cap)
    if with_steps:
        return out, out_lens, ok, steps
    return out, out_lens, ok
