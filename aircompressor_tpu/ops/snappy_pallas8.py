"""Snappy block decode — sublane-batched Pallas TPU megakernel (SUB-way).

Format parity: reference snappy/SnappyRawDecompressor.java:30-220 (varint
length, tag dispatch, strict validation). Same merged parse+emit state
machine as ops/snappy_pallas.py, but each grid step decodes SUB chunks
at once — one per sublane row of (SUB, 128) state tiles.

Why sublane-batched: the single-chunk kernel is latency-bound — its loop body is one
dependency chain of vector ops (~55-110ns each serial, measured), while the
VPU pipelines *independent* chains well (8 chains cost ~1x; 32 chains
~3x for 4x the work — measured). Vectorizing the state machine
across sublanes turns 8 chunk decodes into 8 independent chains with
UNIFORM control flow:

- every per-chunk scalar (ip, op, rem, ...) becomes a (SUB, 128) i32 tile
  with the value replicated across lanes (elementwise updates keep it
  replicated; no broadcasts in the loop);
- the align+place rotate becomes ONE ``take_along_axis`` over an (8, 256)
  concat — one op rotates all 8 chunks by their own amounts (a per-chunk
  ``pltpu.roll`` cannot batch);
- only the per-chunk dynamic row loads/stores stay scalar-addressed; they
  sit under per-chunk ``lax.cond`` so near-copies (served from register
  tiles) skip their loads entirely.

Layout contract: byte p of batch-chunk b lives at row b*R + (p >> 7), lane
p & 127 (input R = Rc rows, output R = OUT_ROWS), as int32. Chunk r of a
grid step is sublane r; its input block rows are [r*Rc, (r+1)*Rc).
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
SUB = 32  # chunks per grid step (4 sublane tiles; 64 measured no better — VPU issue-bound)
OUT_ROWS = 512  # 64KB output per chunk
# 8 pad rows per chunk so the unconditional per-iteration tile store has a
# harmless landing row once a chunk is done (op == 64KB → row 512). A
# per-chunk `pl.when` flush-on-crossing was measured at ~43ns per branch
# (32 branches ≈ 1.4µs of the ~4.2µs iteration); unconditional stores are
# ~3.6ns each. Safe: far copies only SELECT bytes strictly below the
# current output row, so partially-stored rows are never consumed.
PAD_ROWS = 8
OUT_ROWSP = OUT_ROWS + PAD_ROWS
MAX_OUT = OUT_ROWS * LANES


def _rep(x):
    """Replicate an (8, 1)-ish column across lanes."""
    return jnp.broadcast_to(x, (SUB, LANES))


def _decode_kernel(lens_ref, in_ref, out_ref, meta_ref):
    g = pl.program_id(0)
    Rc = in_ref.shape[0] // SUB
    lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    lane2 = jax.lax.broadcasted_iota(I32, (SUB, 2 * LANES), 1)
    zero = jnp.zeros((SUB, LANES), I32)

    clen = _rep(
        jnp.stack([lens_ref[g * SUB + r] for r in range(SUB)]).reshape(SUB, 1))

    def gather2(row_a, row_b, idx):
        """out[r, l] = concat(row_a, row_b, axis=1)[r, idx[r, l]] for
        idx in [0, 256) — Mosaic gathers can't cross a 128-lane vreg, so
        gather each half and select."""
        m = idx & 127
        return jnp.where(
            idx < 128,
            jnp.take_along_axis(row_a, m, axis=1),
            jnp.take_along_axis(row_b, m, axis=1),
        )

    # ---- varint uncompressed length (≤5 bytes), scalar per chunk
    decs, vlens, errs = [], [], []
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
    # err is carried as i32 0/1 (bool vectors in a while carry fail Mosaic
    # legalization of scf.yield)
    err0 = ((declared > MAX_OUT) | (vlen > clen) | (clen > Rc * LANES)).astype(I32)

    def hdr_tile(ip):
        """Two (8, 128) tiles: rows ip>>7 and ip>>7 + 1 of each chunk.
        (A conditional row cache was tried and measured SLOWER — per-chunk
        switch branches that keep carried registers cost more than the
        unconditional loads.)"""
        hwant = ip >> 7
        ra, rb = [], []
        for r in range(SUB):
            # two (1,128) loads per chunk — measured faster than one
            # sublane-unaligned (2,128) pair load (which forces a relayout)
            h = hwant[r, 0]
            h0 = jnp.clip(h, 0, Rc - 1)
            h1 = jnp.clip(h + 1, 0, Rc - 1)
            ra.append(in_ref[pl.ds(r * Rc + h0, 1), :])
            rb.append(in_ref[pl.ds(r * Rc + h1, 1), :])
        return jnp.concatenate(ra, axis=0), jnp.concatenate(rb, axis=0), hwant

    # carry: ip, op, rem, src, from_inp, dist, err, steps, tile, prev
    def cond(c):
        ip, op, rem, err, steps = c[0], c[1], c[2], c[6], c[7]
        more = (rem[:, 0:1] > 0) | (ip[:, 0:1] < clen[:, 0:1])
        live = (err[:, 0:1] == 0) & more
        return (jnp.max(live.astype(I32)) > 0) & (steps < 2 * MAX_OUT)

    def body(c):
        ip, op, rem, src, from_inp, dist, err, steps, tile, prev = c
        active = (err == 0) & ((rem > 0) | (ip < clen))
        need = (rem == 0) & active

        # ---- parse: 5 header bytes via one split-gather on the row pair
        Ha, Hb, hrow = hdr_tile(ip)
        hs = ip & 127
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

        m_rem = jnp.where(need, p_rem, rem)
        m_src = jnp.where(need, ip + tok_size, src)
        m_dist = jnp.where(need, jnp.where(is_lit_tok, jnp.int32(MAX_OUT), cp_dist), dist)
        m_from = jnp.where(need, is_lit_tok.astype(I32), from_inp)
        m_ip = jnp.where(need, ip + tok_size + jnp.where(is_lit_tok, ext, 0), ip)
        n_err = err | (need & p_err).astype(I32)
        n_err_b = n_err > 0

        # ---- emit one ≤128-byte window per chunk
        o = op & 127
        is_copy = (m_from == 0) & active
        is_lit = (m_from == 1) & active
        take = jnp.minimum(m_rem, 128 - o)
        take = jnp.where(is_copy, jnp.minimum(take, m_dist), take)
        take = jnp.where(n_err_b | ~active, 0, take)

        near = is_copy & (m_dist <= o + 127)
        # near source: register pair (prev | tile), offset poff = o+128-dist
        idx_near = (o + 128 - m_dist) + lane - o
        # far/literal source: 2 input or output rows per chunk. Loaded
        # UNCONDITIONALLY — measured: per-chunk lax.switch/cond branches
        # cost far more than the loads they would skip.
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

        # flush: unconditional per-chunk store of the in-progress tile at its
        # row (see PAD_ROWS note). On a crossing iteration this is the row's
        # final value; on others it's a partial write no reader selects, and
        # finished/errored chunks land in the pad rows / masked-out rows.
        for r in range(SUB):
            out_ref[pl.ds(r * OUT_ROWSP + (op[r, 0] >> 7), 1), :] = (
                n_tile[r : r + 1, :])

        n_prev = jnp.where(crossed, n_tile, prev)
        n_tile = jnp.where(crossed, zero, n_tile)
        n_dist = jnp.where(
            is_copy & (take == m_dist), jnp.minimum(m_dist * 2, MAX_OUT), m_dist)
        n_err = n_err | ((take <= 0) & (m_rem > 0) & active).astype(I32)
        return (
            m_ip, n_op, m_rem - take, m_src + take, m_from, n_dist,
            n_err, steps + 1, n_tile, n_prev,
        )

    init = (vlen, zero, zero, zero, zero, zero, err0,
            jnp.int32(0), zero, zero)
    out = jax.lax.while_loop(cond, body, init)
    ip, op, rem, err, steps, tile = out[0], out[1], out[2], out[6], out[7], out[8]

    # no final flush needed: every body iteration stores every chunk's
    # in-progress tile, so the last iteration left all rows final
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
    """Decode B snappy blocks, SUB chunks per grid step, ONE kernel launch.

    Same contract as snappy_pallas.decode: comp (B, Lc) uint8 zero-padded
    (with varint prefix), comp_lens (B,) int32; chunks ≤ 64KB decompressed.
    B is padded to a multiple of SUB internally.
    """
    assert out_cap <= MAX_OUT
    B, Lc = comp.shape
    pad_b = (-B) % SUB
    if pad_b:
        # b"\x00" chunk: varint length 0, decodes to 0 bytes, ok
        pad = jnp.zeros((pad_b, Lc), comp.dtype)
        comp = jnp.concatenate([comp, pad], axis=0)
        comp_lens = jnp.concatenate(
            [comp_lens, jnp.ones((pad_b,), comp_lens.dtype)])
    # ≥1024 bytes of zero slack per chunk: pair loads (2,128) may touch one
    # row past any live byte position (and rows must be a multiple of 8)
    comp = jnp.pad(comp, ((0, 0), (0, 1024 + (-Lc) % 1024)))
    interpret = jax.default_backend() != "tpu"
    out, out_lens, ok, steps = _decode_impl(comp, comp_lens, interpret)
    if pad_b:
        out, out_lens, ok, steps = out[:B], out_lens[:B], ok[:B], steps[:B]
    if out_cap != MAX_OUT:
        out = out[:, :out_cap]
        ok = ok & (out_lens <= out_cap)
    if with_steps:
        return out, out_lens, ok, steps
    return out, out_lens, ok
