"""Zstd device decode tier — Pallas TPU kernels.

Three kernels, one launch each per batch (relay/launch-cost economics:
SURVEY §2.8; host does only header/table parsing — see
zstd/device_prep.py):

- ``huffman_decode`` (kernel A): 8 literal streams per grid step, one symbol
  per stream per iteration. A TPU lane cannot index a per-lane table, so the
  kernel decodes by CANONICAL FIRST-CODE ARITHMETIC: a 12-step threshold walk
  over per-weight region starts (pure vector math on (8,1) columns) yields
  (code length, canonical rank); ranks become bytes at tile-flush time with
  two per-sublane ``take_along_axis`` lookups into the block's symbol
  permutation. Bit feeds are 3 scalar byte loads per stream per iteration
  (scalar loads hide under the ~143ns loop floor; see BASELINE notes).
  Reference parity: zstd/Huffman.java:166-289 decode4Streams — here a whole
  BATCH of streams decodes in one launch.

- ``fse_sequences`` (kernel C): 8 sequences sections per grid step; per
  iteration each row advances its 3 interleaved FSE states (LL/ML/OF),
  reads extra bits, resolves repcodes, and emits one (ll, ml, offset)
  triple. State-table lookups are per-sublane ``take_along_axis`` over
  128-lane table slices (4 LL + 2 OF + 4 ML per iteration), LL/ML base+bits
  tables are shared constant rows. Reference parity:
  zstd/ZstdFrameDecompressor.java:375-460.

- ``execute`` (kernel D): one frame per grid step; the merged parse+emit
  state machine of ops/snappy_pallas.py generalized to zstd sequences:
  literal runs source through a per-block PIECEWISE map (huffman-decoded
  padded regions / raw input bytes / RLE fill) and match copies replay
  frame history with the register-pair near path + flushed-VMEM far path
  and distance doubling for overlaps. Reference parity:
  ZstdFrameDecompressor.java:462-530 (sequence execution + output copy).
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
# Streams per grid step. 8 = one native (8,128) sublane tile. Widening to
# 32 was measured ~2x/row in isolation but MISCOMPILES on the current
# Mosaic (bit-exact in interpret mode and at 8; wrong results at 16/32 —
# see round-2 notes); keep 8 until the lowering is understood.
HUFF_SUB = 8
SEQ_SUB = 8

# param lane layout for kernel A (per stream row; lanes 128..383 = perm)
A_BITBASE, A_REM, A_NSYM, A_OUTROW, A_LOG = 0, 1, 2, 3, 4
A_RS = 8  # rs[1..12] at lanes 8..19
A_CUM = 24  # cum[0..11] at lanes 24..35

# param lane layout for kernel C
C_BITBASE, C_REM, C_NSEQ, C_OUTROW = 0, 1, 2, 3
C_LLS, C_OFS, C_MLS = 4, 5, 6

# block descriptor lanes for kernel D
D_NSEQ, D_SEQROW, D_LITTOTAL = 0, 1, 2
D_PKIND, D_PSRC, D_PEND = 4, 8, 12  # 4 lanes each

# frame descriptor lanes for kernel D
F_DESCBASE, F_NBLOCKS = 0, 1


def _stack8(vals):
    """8 scalars -> (8, 1) vector."""
    return jnp.concatenate([jnp.full((1, 1), v, I32) for v in vals], axis=0)


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _gather2(row_a, row_b, idx):
    """out[r,l] = concat(row_a,row_b,axis=1)[r, idx[r,l]] for idx < 256 —
    Mosaic gathers cannot cross a 128-lane vreg, so gather each half and
    select (same split-gather as ops/snappy_pallas8.py)."""
    m = idx & 127
    return jnp.where(
        idx < 128,
        jnp.take_along_axis(row_a, m, axis=1),
        jnp.take_along_axis(row_b, m, axis=1),
    )


# =========================================================== kernel A: huffman
def _huffman_kernel(iters_ref, params_ref, src_ref, out_ref, meta_ref):
    g = pl.program_id(0)
    iters = iters_ref[g]
    S = HUFF_SUB
    lane = jax.lax.broadcasted_iota(I32, (S, LANES), 1)
    src_rows = src_ref.shape[0]

    p = params_ref[:, :]
    log = p[:, A_LOG : A_LOG + 1]  # (8,1)
    bitbase = p[:, A_BITBASE : A_BITBASE + 1]
    nsym = p[:, A_NSYM : A_NSYM + 1]
    perm0 = p[:, 128:256]
    perm1 = p[:, 256:384]
    rs = [None] + [p[:, A_RS + w - 1 : A_RS + w] for w in range(1, 13)]
    cum = [p[:, A_CUM + w : A_CUM + w + 1] for w in range(12)]

    def peek(rem):
        """Top log bits of all 8 streams at once (zero-padded near the end):
        per-stream dynamic ROW-pair loads (scalar element reads of the
        vector carry give the row indices; the loads hide under the loop
        floor) + ONE split-gather for the 3 feed bytes of every stream —
        replaces 24 lane-compare reductions per iteration."""
        take = jnp.clip(rem, 0, log)
        lo_bit = bitbase + rem - take
        byte0 = lo_bit >> 3  # (8,1)
        sh = lo_bit & 7
        ra, rb = [], []
        for r in range(S):
            r0 = byte0[r, 0] >> 7
            ra.append(src_ref[pl.ds(jnp.clip(r0, 0, src_rows - 1), 1), :])
            rb.append(src_ref[pl.ds(jnp.clip(r0 + 1, 0, src_rows - 1), 1), :])
        Ha = jnp.concatenate(ra, axis=0)
        Hb = jnp.concatenate(rb, axis=0)
        pk = _gather2(Ha, Hb, (byte0 & 127) + jnp.minimum(lane, 2))
        w = pk[:, 0:1] | (pk[:, 1:2] << 8) | (pk[:, 2:3] << 16)
        v = _srl(w, sh) & ((1 << take) - 1)
        return v << (log - take)

    def flush(i_row, tile):
        """ranks tile -> bytes via the 2-row perm lookup, store per row.
        Rows whose stream has no symbols in this tile (incl. padding
        streams with nsym=0) must not store — their out_base is shared."""
        idx = tile & 127
        sym = jnp.where(
            tile < 128,
            jnp.take_along_axis(perm0, idx, axis=1),
            jnp.take_along_axis(perm1, idx, axis=1),
        )
        for r in range(S):
            row = params_ref[r, A_OUTROW] + i_row

            @pl.when(i_row * 128 < params_ref[r, A_NSYM])
            def _():
                out_ref[pl.ds(row, 1), :] = sym[r : r + 1, :]

    def body(i, c):
        rem, tile = c
        st = peek(rem)
        rank = jnp.zeros((S, 1), I32)
        nb = jnp.zeros((S, 1), I32)
        for w in range(1, 13):
            ge = st >= rs[w]
            rank = jnp.where(ge, cum[w - 1] + ((st - rs[w]) >> (w - 1)), rank)
            nb = jnp.where(ge, log + 1 - w, nb)
        tile = jnp.where(lane == (i & 127), rank, tile)
        rem = jnp.where(i < nsym, rem - nb, rem)

        @pl.when((i & 127) == 127)
        def _():
            flush(i >> 7, tile)

        tile = jnp.where((i & 127) == 127, jnp.zeros((S, LANES), I32), tile)
        return (rem, tile)

    init = (p[:, A_REM : A_REM + 1], jnp.zeros((S, LANES), I32))
    rem, tile = jax.lax.fori_loop(0, iters, body, init)

    @pl.when((iters & 127) != 0)
    def _():
        flush(iters >> 7, tile)

    meta_ref[0, :, :] = jnp.where(lane == 0, rem, 0)


@partial(jax.jit, static_argnames=("interpret", "out_rows"))
def huffman_decode(iters, params, src_rows, out_rows: int, interpret: bool):
    """Decode G*HUFF_SUB Huffman literal streams in one launch.

    iters: (G,) max symbols per group; params: (G*HUFF_SUB, 384) i32;
    src_rows: (R, 128) i32 byte rows. Returns (litpad bytes (out_rows,128) i32,
    final rem (G*8,))."""
    G = iters.shape[0]
    out, meta = pl.pallas_call(
        _huffman_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((HUFF_SUB, 384), lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(src_rows.shape, lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((out_rows, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HUFF_SUB, LANES), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, LANES), I32),
            jax.ShapeDtypeStruct((G, HUFF_SUB, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(iters.astype(I32), params.astype(I32), src_rows)
    return out, meta[:, :, 0].reshape(-1)


# ======================================================== kernel C: sequences
def _fse_kernel(iters_ref, params_ref, tabs_ref, info_ref, srcw_ref,
                ll_ref, ml_ref, of_ref, meta_ref):
    g = pl.program_id(0)
    iters = iters_ref[g]
    S = SEQ_SUB
    lane = jax.lax.broadcasted_iota(I32, (S, LANES), 1)
    srcw_rows = srcw_ref.shape[0]

    llinfo = jnp.broadcast_to(info_ref[0:1, :], (S, LANES))
    mlinfo = jnp.broadcast_to(info_ref[1:2, :], (S, LANES))

    def lookup(slices, st):
        """Per-sublane state-table lookup over 128-lane slices."""
        idx = st & 127
        hi = st >> 7
        out = jnp.zeros((S, 1), I32)
        for h, sl in enumerate(slices):
            v = jnp.take_along_axis(tabs_ref[0, sl, :, :], jnp.broadcast_to(idx, (S, LANES)), axis=1)[:, 0:1]
            out = jnp.where(hi == h, v, out)
        return out

    bitbase = params_ref[:, C_BITBASE : C_BITBASE + 1]

    def body(i, c):
        rem, lls, ofs, mls, rep0, rep1, rep2, tl, tm, to, err = c

        le = lookup((0, 1, 2, 3), lls)
        oe = lookup((4, 5), ofs)
        me = lookup((6, 7, 8, 9), mls)
        ll_code = le & 63
        of_code = oe & 63
        ml_code = me & 63
        ll_nb, ll_ns = (le >> 6) & 15, le >> 10
        of_nb, of_ns = (oe >> 6) & 15, oe >> 10
        ml_nb, ml_ns = (me >> 6) & 15, me >> 10
        lli = jnp.take_along_axis(llinfo, jnp.broadcast_to(ll_code, (S, LANES)), axis=1)[:, 0:1]
        mli = jnp.take_along_axis(mlinfo, jnp.broadcast_to(ml_code, (S, LANES)), axis=1)[:, 0:1]
        ll_xbits, ll_base = lli & 31, _srl(lli, 5)
        ml_xbits, ml_base = mli & 31, _srl(mli, 5)

        # fetch 5 u32 words covering the <=81 bits this iteration can consume
        # (of 23 + ml/ll extra 16+16 + state refills 9+9+8); the 82-bit floor
        # keeps every extract() above the fetched window's base word. One
        # dynamic row-pair load per stream + ONE split-gather for all 40
        # words (replaces 40 lane-compare reductions per iteration).
        qwv = jnp.maximum(((bitbase + rem) - 82) >> 5, 0)  # (8,1)
        ra, rb = [], []
        for r in range(S):
            r0 = qwv[r, 0] >> 7
            ra.append(srcw_ref[pl.ds(jnp.clip(r0, 0, srcw_rows - 1), 1), :])
            rb.append(srcw_ref[pl.ds(jnp.clip(r0 + 1, 0, srcw_rows - 1), 1), :])
        Wa = jnp.concatenate(ra, axis=0)
        Wb = jnp.concatenate(rb, axis=0)
        pk = _gather2(Wa, Wb, (qwv & 127) + jnp.minimum(lane, 4))
        w = [pk[:, k : k + 1] for k in range(5)]
        remv = rem
        bbase = bitbase

        def extract(pos, n):
            """n bits (vector widths) at bit position pos (stream-relative)."""
            rel = jnp.maximum(bbase + pos - qwv * 32, 0)
            k = rel >> 5
            lo = jnp.zeros((S, 1), I32)
            hi = jnp.zeros((S, 1), I32)
            for kk in range(4):
                lo = jnp.where(k == kk, w[kk], lo)
                hi = jnp.where(k == kk, w[kk + 1], hi)
            sh = rel & 31
            v = _srl(lo, sh) | jnp.where(sh > 0, hi << (32 - sh), 0)
            return v & jnp.where(n >= 31, -1, (1 << n) - 1)

        err = err | (of_code > 23).astype(I32)
        of_code = jnp.minimum(of_code, 23)
        p = remv - of_code
        offset_value = (1 << of_code) + extract(p, of_code)
        p = p - ml_xbits
        match_len = ml_base + extract(p, ml_xbits)
        p = p - ll_xbits
        lit_run = ll_base + extract(p, ll_xbits)

        # repcodes (reference: ZstdFrameDecompressor L416-450)
        direct = offset_value > 3
        idx = offset_value - 1 + jnp.where(lit_run == 0, 1, 0)
        rsel = jnp.where(
            idx == 0, rep0,
            jnp.where(idx == 1, rep1, jnp.where(idx == 2, rep2, rep0 - 1)),
        )
        offset = jnp.where(direct, offset_value - 3, rsel)
        err = err | ((~direct) & (idx > 0) & (rsel <= 0)).astype(I32)
        n_rep0 = offset
        n_rep1 = jnp.where(direct | (idx > 0), rep0, rep1)
        n_rep2 = jnp.where(
            direct | (idx >= 2), rep1, jnp.where(idx == 1, rep2, rep2)
        )
        # idx == 0: reps unchanged
        keep = (~direct) & (idx == 0)
        n_rep0 = jnp.where(keep, rep0, n_rep0)
        n_rep1 = jnp.where(keep, rep1, n_rep1)
        n_rep2 = jnp.where(keep, rep2, n_rep2)

        # state updates (order LL, ML, OF) — skipped on each row's final seq
        nseq = params_ref[:, C_NSEQ : C_NSEQ + 1]
        lastv = i >= nseq - 1
        p = p - jnp.where(lastv, 0, ll_nb)
        n_lls = jnp.where(lastv, lls, ll_ns + extract(p, ll_nb))
        p = p - jnp.where(lastv, 0, ml_nb)
        n_mls = jnp.where(lastv, mls, ml_ns + extract(p, ml_nb))
        p = p - jnp.where(lastv, 0, of_nb)
        n_ofs = jnp.where(lastv, ofs, of_ns + extract(p, of_nb))

        active = i < nseq
        consumed = remv - p
        tl = jnp.where((lane == (i & 127)) & active, lit_run, tl)
        tm = jnp.where((lane == (i & 127)) & active, match_len, tm)
        to = jnp.where((lane == (i & 127)) & active, offset, to)
        err = err | (active & (p < 0)).astype(I32)

        new_rem = jnp.where(active, rem - consumed, rem)

        @pl.when((i & 127) == 127)
        def _():
            for r in range(S):
                row = params_ref[r, C_OUTROW] + (i >> 7)

                @pl.when((i >> 7) * 128 < params_ref[r, C_NSEQ])
                def _():
                    ll_ref[pl.ds(row, 1), :] = tl[r : r + 1, :]
                    ml_ref[pl.ds(row, 1), :] = tm[r : r + 1, :]
                    of_ref[pl.ds(row, 1), :] = to[r : r + 1, :]

        zero = jnp.zeros((S, LANES), I32)
        crossed = (i & 127) == 127
        tl = jnp.where(crossed, zero, tl)
        tm = jnp.where(crossed, zero, tm)
        to = jnp.where(crossed, zero, to)

        keep_s = ~active
        n_lls = jnp.where(keep_s, lls, n_lls)
        n_mls = jnp.where(keep_s, mls, n_mls)
        n_ofs = jnp.where(keep_s, ofs, n_ofs)
        n_rep0 = jnp.where(keep_s, rep0, n_rep0)
        n_rep1 = jnp.where(keep_s, rep1, n_rep1)
        n_rep2 = jnp.where(keep_s, rep2, n_rep2)
        return (new_rem, n_lls, n_ofs, n_mls,
                n_rep0, n_rep1, n_rep2, tl, tm, to, err)

    zero_t = jnp.zeros((S, LANES), I32)
    ones = jnp.ones((S, 1), I32)
    init = (
        params_ref[:, C_REM : C_REM + 1],
        params_ref[:, C_LLS : C_LLS + 1],
        params_ref[:, C_OFS : C_OFS + 1],
        params_ref[:, C_MLS : C_MLS + 1],
        ones, ones * 4, ones * 8,
        zero_t, zero_t, zero_t,
        jnp.zeros((S, 1), I32),
    )
    out = jax.lax.fori_loop(0, iters, body, init)
    rem, tl, tm, to, err = out[0], out[7], out[8], out[9], out[10]

    @pl.when((iters & 127) != 0)
    def _():
        for r in range(S):
            row = params_ref[r, C_OUTROW] + (iters >> 7)

            @pl.when((iters >> 7) * 128 < params_ref[r, C_NSEQ])
            def _():
                ll_ref[pl.ds(row, 1), :] = tl[r : r + 1, :]
                ml_ref[pl.ds(row, 1), :] = tm[r : r + 1, :]
                of_ref[pl.ds(row, 1), :] = to[r : r + 1, :]

    meta_ref[0, :, :] = jnp.where(
        lane == 0, rem, jnp.where(lane == 1, err, 0)
    )


@partial(jax.jit, static_argnames=("interpret", "seq_rows"))
def fse_sequences(iters, params, tabs, info, srcw_rows, seq_rows: int,
                  interpret: bool):
    """Decode G*SEQ_SUB sequences sections in one launch.

    iters: (G,); params: (G*SEQ_SUB, 128); tabs: (G, 10, SEQ_SUB, 128) FSE slices;
    info: (8, 128) [ll|ml]info const rows; srcw_rows: (Rw, 128) i32 LE words.
    Returns (ll, ml, of (seq_rows,128) i32, rem (G*8,), err (G*8,))."""
    G = iters.shape[0]
    ll, ml, of, meta = pl.pallas_call(
        _fse_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((SEQ_SUB, 128), lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 10, SEQ_SUB, 128), lambda g, *_: (g, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(srcw_rows.shape, lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((seq_rows, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((seq_rows, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((seq_rows, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SEQ_SUB, LANES), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((seq_rows, LANES), I32),
            jax.ShapeDtypeStruct((seq_rows, LANES), I32),
            jax.ShapeDtypeStruct((seq_rows, LANES), I32),
            jax.ShapeDtypeStruct((G, SEQ_SUB, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(iters.astype(I32), params.astype(I32), tabs.astype(I32),
      info.astype(I32), srcw_rows)
    return (ll, ml, of, meta[:, :, 0].reshape(-1), meta[:, :, 1].reshape(-1))


# ========================================================= kernel D: execute
PIECE_HUFF, PIECE_RAW, PIECE_RLE = 0, 1, 2


def _execute_kernel(iters_ref, frames_ref, desc_ref, seq_ll_ref, seq_ml_ref,
                    seq_of_ref, lit_ref, src_ref, out_ref, meta_ref):
    f = pl.program_id(0)
    iters = iters_ref[f]
    out_rows = out_ref.shape[0]
    lane = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
    zero_tile = jnp.zeros((1, LANES), I32)

    n_blocks = frames_ref[0, 0, F_NBLOCKS]
    desc_base = frames_ref[0, 0, F_DESCBASE]
    desc_rows = desc_ref.shape[0]
    seq_rows = seq_ll_ref.shape[0]

    def load_pair(ref, row_cap, pos):
        r = pos >> 7
        r0 = jnp.clip(r, 0, row_cap - 1)
        r1 = jnp.clip(r + 1, 0, row_cap - 1)
        return ref[pl.ds(r0, 1), :], ref[pl.ds(r1, 1), :]

    def place(row_a, row_b, src_lane, o):
        rot = (o - src_lane) & 127
        a = pltpu.roll(row_a, rot, 1)
        bb = pltpu.roll(row_b, rot, 1)
        return jnp.where(lane < o + 128 - src_lane, a, bb)

    def desc_row(b):
        """One block descriptor as a (1,128) vector (dynamic ROW load; lanes
        extracted statically — Mosaic forbids dynamic lane indexing)."""
        return desc_ref[pl.ds(jnp.clip(desc_base + b, 0, desc_rows - 1), 1), :]

    def at(vec, lane_i):
        return jnp.sum(jax.lax.slice(vec, (0, lane_i), (1, lane_i + 1)))

    # carry:
    #  bi: current block index; si: seq index within block; op: frame out pos
    #  phase: 0 = schedule next run, 1 = literal run, 2 = match
    #  rem: bytes left in current run; litpos: literals consumed in block
    #  dist: match distance; tile/prev: output row registers; err, steps
    def cond(c):
        bi, err, steps = c[0], c[9], c[10]
        return (bi < n_blocks) & (~err) & (steps < iters)

    def body(c):
        (bi, si, op, phase, rem, litpos, dist, tile, prev, err, steps) = c

        drow = desc_row(bi)
        n_seq = at(drow, D_NSEQ)
        lit_total = at(drow, D_LITTOTAL)

        # ---- phase 0: schedule the next run (seq literal, match, or tail)
        need = phase == 0
        in_seqs = si < n_seq
        seq_row = jnp.clip(at(drow, D_SEQROW) + (si >> 7), 0, seq_rows - 1)
        s_lane = si & 127
        ll_row = seq_ll_ref[pl.ds(seq_row, 1), :]
        ml_row = seq_ml_ref[pl.ds(seq_row, 1), :]
        of_row = seq_of_ref[pl.ds(seq_row, 1), :]
        s_pick = lane == s_lane
        ll = jnp.where(in_seqs, jnp.sum(jnp.where(s_pick, ll_row, 0)), 0)
        ml = jnp.where(in_seqs, jnp.sum(jnp.where(s_pick, ml_row, 0)), 0)
        of = jnp.where(in_seqs, jnp.sum(jnp.where(s_pick, of_row, 0)), 0)
        tail = jnp.where(in_seqs, 0, lit_total - litpos)

        lit_n = jnp.where(in_seqs, ll, tail)
        go_lit = need & (lit_n > 0)
        go_match = need & in_seqs & (lit_n <= 0)
        m_phase = jnp.where(go_lit, 1, jnp.where(go_match, 2, phase))
        m_rem = jnp.where(go_lit, lit_n, jnp.where(go_match, ml, rem))
        m_dist = jnp.where(go_match, of, dist)
        # block advance: no seqs left and no tail
        adv_block = need & ~in_seqs & (tail <= 0)
        n_bi = jnp.where(adv_block, bi + 1, bi)
        n_si = jnp.where(adv_block, 0, si)
        n_litpos = jnp.where(adv_block, 0, litpos)

        err_n = err | (need & in_seqs & (
            (ml < 0) | (ll < 0)
            | (litpos + jnp.clip(ll, 0, 1 << 24) > lit_total)))

        # ---- emit one window of the current run
        o = op & 127
        is_lit = m_phase == 1
        is_match = m_phase == 2
        active = (is_lit | is_match) & (m_rem > 0) & ~adv_block
        err_n = err_n | (is_match & active & ((m_dist <= 0) | (m_dist > op)))

        # piece lookup for literals (pieces have strictly increasing ends)
        ndrow = desc_row(n_bi)
        pend = jnp.int32(0)
        pprev = jnp.int32(0)
        pkind = jnp.int32(0)
        psrc = jnp.int32(0)
        found = jnp.bool_(False)
        prev_k = jnp.int32(0)
        for k in range(4):
            e_k = at(ndrow, D_PEND + k)
            sel = (~found) & (n_litpos < e_k)
            pend = jnp.where(sel, e_k, pend)
            pprev = jnp.where(sel, prev_k, pprev)
            pkind = jnp.where(sel, at(ndrow, D_PKIND + k), pkind)
            psrc = jnp.where(sel, at(ndrow, D_PSRC + k), psrc)
            found = found | sel
            prev_k = e_k

        take = jnp.minimum(m_rem, 128 - o)
        take = jnp.where(is_lit, jnp.minimum(take, pend - n_litpos), take)
        take = jnp.where(is_match, jnp.minimum(take, m_dist), take)
        take = jnp.minimum(take, jnp.maximum(out_rows * LANES - op, 0))
        err_n = err_n | (is_lit & active & ~found)
        take = jnp.where(active & ~err_n, jnp.maximum(take, 0), 0)

        def match_window(_):
            def near(_):
                poff = o + 128 - m_dist
                ra = jnp.where(poff < 128, prev, tile)
                return place(ra, tile, poff & 127, o)

            def far(_):
                q = op - m_dist
                ra, rb = load_pair(out_ref, out_rows, q)
                return place(ra, rb, q & 127, o)

            return jax.lax.cond(m_dist > o + 127, far, near, None)

        def lit_window(_):
            def huff(_):
                q = psrc + (n_litpos - pprev)
                ra, rb = load_pair(lit_ref, lit_ref.shape[0], q)
                return place(ra, rb, q & 127, o)

            def raw(_):
                q = psrc + (n_litpos - pprev)
                ra, rb = load_pair(src_ref, src_ref.shape[0], q)
                return place(ra, rb, q & 127, o)

            def rle(_):
                return jnp.full((1, LANES), psrc, I32)

            return jax.lax.cond(
                pkind == PIECE_RLE, rle,
                lambda _: jax.lax.cond(pkind == PIECE_RAW, raw, huff, None),
                None)

        placed = jax.lax.cond(is_match, match_window, lit_window, None)
        mask = (lane >= o) & (lane < o + take)
        n_tile = jnp.where(mask, placed, tile)
        n_op = op + take
        crossed = ((n_op & 127) == 0) & (take > 0)

        @pl.when(crossed)
        def _():
            out_ref[pl.ds(op >> 7, 1), :] = n_tile

        n_prev = jnp.where(crossed, n_tile, prev)
        n_tile = jnp.where(crossed, zero_tile, n_tile)

        n_rem = m_rem - take
        n_litpos = jnp.where(is_lit & active, n_litpos + take, n_litpos)
        n_dist = jnp.where(
            is_match & (take == m_dist) & (take > 0),
            jnp.minimum(m_dist * 2, 1 << 24), m_dist)

        # run finished: seq literal -> its match (or next seq if ml==0);
        # match -> next seq; tail -> next block
        fin = active & (n_rem == 0)
        fin_seq_lit = fin & is_lit & in_seqs
        fin_tail = fin & is_lit & ~in_seqs
        fin_match = fin & is_match
        n_phase = jnp.where(fin_seq_lit & (ml > 0), 2, jnp.where(fin, 0, m_phase))
        n_phase = jnp.where(adv_block, 0, n_phase)
        n_rem = jnp.where(fin_seq_lit & (ml > 0), ml, n_rem)
        n_dist = jnp.where(fin_seq_lit & (ml > 0), of, n_dist)
        n_si = jnp.where(fin_match | (fin_seq_lit & (ml <= 0)), n_si + 1, n_si)
        n_bi = jnp.where(fin_tail, n_bi + 1, n_bi)
        n_si = jnp.where(fin_tail, 0, n_si)
        n_litpos = jnp.where(fin_tail, 0, n_litpos)

        err_n = err_n | (active & (take <= 0))
        return (n_bi, n_si, n_op, n_phase, n_rem, n_litpos, n_dist,
                n_tile, n_prev, err_n, steps + 1)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0), jnp.int32(0), jnp.int32(1),
            zero_tile, zero_tile, jnp.bool_(False), jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    bi, op, err, steps = out[0], out[2], out[9], out[10]

    @pl.when((op & 127) != 0)
    def _():
        out_ref[pl.ds(op >> 7, 1), :] = out[7]

    ok = (~err) & (bi >= n_blocks)
    meta_ref[0, 0:1, :] = jnp.where(
        lane == 0, jnp.where(ok, op, -1),
        jnp.where(lane == 1, ok.astype(I32), jnp.where(lane == 2, steps, 0)))


@partial(jax.jit, static_argnames=("interpret", "out_rows_per_frame"))
def execute(iters, frames, desc, seq_ll, seq_ml, seq_of, litpad, src_rows,
            out_rows_per_frame: int, interpret: bool):
    """Execute all frames' sequences in one launch.

    iters: (F,) iteration bounds; frames: (F,128); desc: (BD,128) block
    descriptors; seq_*: (S,128) triples; litpad: (L,128) literal bytes;
    src_rows: (R,128) input bytes. Returns (out (F*out_rows,128) u8,
    out_len (F,), ok (F,))."""
    F = iters.shape[0]
    out, meta = pl.pallas_call(
        _execute_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(F,),
            in_specs=[
                pl.BlockSpec((1, 1, LANES), lambda f, *_: (f, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(desc.shape, lambda f, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(seq_ll.shape, lambda f, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(seq_ml.shape, lambda f, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(seq_of.shape, lambda f, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(litpad.shape, lambda f, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(src_rows.shape, lambda f, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((out_rows_per_frame, LANES), lambda f, *_: (f, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, LANES), lambda f, *_: (f, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F * out_rows_per_frame, LANES), I32),
            jax.ShapeDtypeStruct((F, 8, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(iters.astype(I32), frames.astype(I32).reshape(F, 1, LANES),
      desc.astype(I32), seq_ll, seq_ml, seq_of, litpad, src_rows)
    out_len = meta[:, 0, 0]
    ok = meta[:, 0, 1] > 0
    # uint8 on device: the caller offloads `out` to the host — casting in
    # the same program quarters the device->host transfer
    return out.astype(jnp.uint8), out_len, ok
