"""LZO1X block decode — sublane-batched Pallas TPU megakernel (SUB-way).

Format parity: reference lzo/LzoRawDecompressor.java:72-345 (five command
families M1/M1'/M2/M3/M4, zero-extension lengths, trailing-literal state
machine, mandatory stop command — see lzo/block_ref.py for the own host
tier this kernel is differentially tested against).

Same vectorized SUB-chunks-per-grid-step architecture as
ops/lz4_pallas.py / ops/snappy_pallas8.py (see their docstrings for the
cost model). LZO's grammar needs one more machine than LZ4's:

  0 TOKEN   dispatch on (t, state): standalone literal run / M1 / M1' /
            M2 launch immediately; M3/M4 with inline lengths read their
            LE16 distance in the same iteration; zero-extended lengths
            enter LENEXT
  1 LENEXT  consume ≤4 zero-extension bytes per iteration (each zero adds
            255; the first nonzero byte terminates)
  2 DIST    the LE16 distance word of a length-extended M3/M4
  3 TRAIL   after every copy: launch the 0..3 trailing literals encoded
            in the command's low bits (they become the next token's
            ``state``)
  4 DONE    terminal — entered by the M4 stop command (dist == 16384)

plus the run-in-flight state (rem/src/from/dist) shared with the LZ4
kernel and the same register-tile emit engine.
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

PH_TOKEN, PH_LENEXT, PH_DIST, PH_TRAIL, PH_DONE = 0, 1, 2, 3, 4
K_STAND, K_M3, K_M4 = 0, 1, 2
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

    # ---- first-byte special (reference: stream starting with t > 17 is a
    # literal run of t-17 bytes), scalar per chunk like snappy's varint
    t0s = []
    for r in range(SUB):
        t0s.append(in_ref[r * Rc, 0])
    t0 = _rep(jnp.stack(t0s).reshape(SUB, 1))
    first_lit = t0 > 17
    rem0 = jnp.where(first_lit, t0 - 17, 0)
    ip0 = jnp.where(first_lit, 1 + rem0, jnp.int32(0))
    src0 = jnp.where(first_lit, 1, 0)
    from0 = jnp.where(first_lit, FROM_LIT, FROM_COPY)
    state0 = jnp.where(first_lit, jnp.minimum(rem0, 4), 0)
    err0 = ((clen <= 0) | (clen > Rc * LANES)
            | (first_lit & (ip0 > clen))).astype(I32)

    # carry: ip, op, rem, src, from_inp, dist, phase, state, acc, kind,
    #        pflag, pend_tr, err, steps, tile, prev
    def cond(c):
        ip, op, rem, phase, err, steps = c[0], c[1], c[2], c[6], c[12], c[13]
        more = (rem[:, 0:1] > 0) | (
            (ip[:, 0:1] < clen[:, 0:1]) & (phase[:, 0:1] != PH_DONE))
        live = (err[:, 0:1] == 0) & more
        return (jnp.max(live.astype(I32)) > 0) & (steps < 4 * MAX_OUT)

    def body(c):
        (ip, op, rem, src, from_inp, dist, phase, state, acc, kind,
         pflag, pend_tr, err, steps, tile, prev) = c
        active = (err == 0) & (
            (rem > 0) | ((ip < clen) & (phase != PH_DONE)))
        need = (rem == 0) & active & (phase != PH_DONE)

        # ---- up to 3 header bytes at ip (token + LE16 / extension window)
        Ha, Hb = in_rows(ip)
        hs = ip & 127
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

        # immediate-launch families
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
        # extended M3/M4 consume ONLY the token byte here — their length
        # extension and LE16 follow in LENEXT/DIST phases
        tok_size = jnp.where(stand | goes_ext, 1,
                             jnp.where(m3 | m4, 3, 2))
        is_stop = m4 & ~m4_ext & (cp_dist == 16384)

        tk_lit_launch = stand & ~stand_ext  # standalone run of t+3
        tk_cpy_launch = (m1 | m1p | m2 | (m4 & ~m4_ext & ~is_stop)
                         | (m3 & ~m3_ext))
        tk_rem = jnp.where(tk_lit_launch, t + 3, jnp.where(tk_cpy_launch, cp_len, 0))
        tk_acc = jnp.where(stand_ext, 18, jnp.where(m4_ext, 9, 33))  # base+3 / base+2
        tk_kind = jnp.where(stand_ext, K_STAND, jnp.where(m4_ext, K_M4, K_M3))
        tk_phase = jnp.where(
            is_stop, PH_DONE,
            jnp.where(goes_ext, PH_LENEXT,
                      jnp.where(tk_cpy_launch, PH_TRAIL, PH_TOKEN)))
        tk_ip = ip + tok_size

        # ---- phase LENEXT: ≤4 zero bytes per iteration
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

        # ---- phase DIST: the LE16 of a length-extended M3/M4
        d_le16 = b0 | (b1 << 8)
        d_dist = jnp.where(
            kind == K_M4, 16384 + (pflag << 14) + (d_le16 >> 2),
            (d_le16 >> 2) + 1)
        d_stop = (kind == K_M4) & (d_dist == 16384)
        d_tr = d_le16 & 3
        d_ip = ip + 2

        # ---- merge parse results by phase
        ph_tok = need & (phase == PH_TOKEN)
        ph_lx = need & (phase == PH_LENEXT)
        ph_ds = need & (phase == PH_DIST)
        ph_tr = need & (phase == PH_TRAIL)

        lx_fin = ph_lx & ext_done
        lx_lit = lx_fin & (kind == K_STAND)  # extended standalone run
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
        # state: 4 after a standalone run; trailing count after TRAIL
        n_state = jnp.where(
            (ph_tok & tk_lit_launch) | lx_lit, 4,
            jnp.where(ph_tr, pend_tr, state))
        # stop parks the stream: input after the stop command is ignored
        new_ip = jnp.where(
            (ph_tok & is_stop) | (ph_ds & d_stop), clen, new_ip)

        m_rem = jnp.where(need, p_rem, rem)
        # token/LE16 bytes past the input end (checked BEFORE the stop
        # override parks new_ip at clen — a truncated stop is malformed)
        tok_over = (ph_tok & (tk_ip > clen)) | (ph_ds & (d_ip > clen))
        # a scheduled run longer than the whole output budget is malformed
        # on its own (clip would otherwise let op==0 + MAX_OUT pass)
        p_err = tok_over | (need & (new_ip > clen)) | (
            launches_cpy & ((n_dist <= 0) | (n_dist > op))) | (
            need & (m_rem > MAX_OUT)) | (
            need & (op + jnp.clip(m_rem, 0, MAX_OUT) > MAX_OUT))
        n_err = err | p_err.astype(I32)
        n_err_b = n_err > 0
        m_src = jnp.where(need, n_src, src)
        m_from = jnp.where(need, n_from, from_inp)
        m_dist = jnp.where(need, n_dist, dist)
        m_ip = jnp.where(need, new_ip, ip)
        m_phase = jnp.where(need, n_phase, phase)
        m_state = jnp.where(need, n_state, state)
        m_acc = jnp.where(need, n_acc, acc)
        m_kind = jnp.where(need, n_kind, kind)
        m_pflag = jnp.where(need, n_pflag, pflag)
        m_pend = jnp.where(need, n_pend, pend_tr)

        # ---- emit one ≤128-byte window (shared engine)
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
            out_ref[pl.ds(r * OUT_ROWSP + row, 1), :] = (
                n_tile[r : r + 1, :])

        n_prev = jnp.where(crossed, n_tile, prev)
        n_tile = jnp.where(crossed, zero, n_tile)
        n_dist2 = jnp.where(
            is_copy & (take == m_dist), jnp.minimum(m_dist * 2, MAX_OUT), m_dist)
        n_err = n_err | ((take <= 0) & (m_rem > 0) & active).astype(I32)
        return (
            m_ip, n_op, m_rem - take, m_src + take, m_from, n_dist2,
            m_phase, m_state, m_acc, m_kind, m_pflag, m_pend,
            n_err, steps + 1, n_tile, n_prev,
        )

    init = (ip0, zero, rem0, src0, from0, zero, zero, state0, zero, zero,
            zero, zero, err0, jnp.int32(0), zero, zero)
    out = jax.lax.while_loop(cond, body, init)
    op, rem, phase, err, steps, tile = (
        out[1], out[2], out[6], out[12], out[13], out[14])

    # (no final flush needed: every body iteration stores every chunk's
    # in-progress tile, so the last iteration left all rows final)
    # valid end: the M4 stop command was seen (phase DONE) with no run in
    # flight — input without a stop command is malformed (reference:
    # LzoRawDecompressor "missing stop command")
    ok = (err == 0) & (rem == 0) & (phase == PH_DONE)
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
    """Decode B LZO1X blocks (≤64KB decompressed each), SUB chunks per grid
    step, ONE kernel launch.

    comp (B, Lc) uint8 zero-padded, comp_lens (B,) int32. B is padded to a
    multiple of SUB internally."""
    assert out_cap <= MAX_OUT
    B, Lc = comp.shape
    pad_b = (-B) % SUB
    if pad_b:
        # minimal valid stream: empty literal section + stop (17 = M4 stop
        # family first byte is not needed: 0x11 0x00 0x00 is the canonical
        # empty-stream stop sequence)
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
    # codec-independent backstop (see lz4_pallas.decode)
    ok = ok & (out_lens <= MAX_OUT)
    if out_cap != MAX_OUT:
        out = out[:, :out_cap]
        ok = ok & (out_lens <= out_cap)
    if with_steps:
        return out, out_lens, ok, steps
    return out, out_lens, ok
