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

- ``execute`` (kernel D): EXEC_G interleaved groups of EXEC_SUB frames
  per grid step, one frame per sublane row of vectorized state tiles; the merged parse+emit
  state machine of ops/snappy_pallas8.py generalized to zstd sequences:
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
F_DESCBASE, F_NBLOCKS, F_ITERS = 0, 1, 2

EXEC_SUB = 8  # frames per kernel-D state tile (one per sublane row)
EXEC_G = 4  # interleaved independent groups per grid step (r4: the VPU
# absorbs multiple dependency chains for free — measured on the snappy
# megakernel — so 4 groups execute 32 frames/step at roughly the
# single-group iteration cost)
OUT_PAD_ROWS = 2  # harmless landing rows for kernel D's unconditional flush


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
# Independent 8-stream groups interleaved per grid step: the VPU absorbs
# multiple dependency chains for free (measured on the snappy megakernel —
# 8 independent op streams cost the same as 1), so AG chains decode
# AG*HUFF_SUB streams per step at roughly the single-chain iteration cost.
HUFF_AG = 8


def _huffman_kernel(iters_ref, params_ref, src_ref, out_ref, meta_ref):
    g = pl.program_id(0)
    iters = iters_ref[g]
    S = HUFF_SUB
    lane = jax.lax.broadcasted_iota(I32, (S, LANES), 1)
    src_rows = src_ref.shape[0]

    groups = []
    for a in range(HUFF_AG):
        p = params_ref[a * S : (a + 1) * S, :]
        groups.append(dict(
            p=p,
            log=p[:, A_LOG : A_LOG + 1],
            bitbase=p[:, A_BITBASE : A_BITBASE + 1],
            nsym=p[:, A_NSYM : A_NSYM + 1],
            perm0=p[:, 128:256],
            perm1=p[:, 256:384],
            rs=[None] + [p[:, A_RS + w - 1 : A_RS + w] for w in range(1, 13)],
            cum=[p[:, A_CUM + w : A_CUM + w + 1] for w in range(12)],
        ))

    A_T = 64  # iterations served per stream-window reload: a (2,128) row
    # pair holds 2048 bits and one iteration consumes <= 12, so 64
    # iterations stay inside it — the scalar-unit loads (the binding
    # resource) amortize 64x vs a load per iteration.

    def load_window(gr, rem):
        """(Ha, Hb, base_byte) rows (r_hi-1, r_hi) per stream, where r_hi
        is the row holding the stream's current top byte."""
        # +2: the 3-byte peek reads up to 2 bytes above the stream's top
        # byte; the window's upper row must contain them
        hi_byte = ((gr["bitbase"] + rem) >> 3) + 2
        ra, rb = [], []
        r_his = []
        for r in range(S):
            r_hi = jnp.clip(hi_byte[r, 0] >> 7, 1, src_rows - 1)
            pr = src_ref[pl.ds(r_hi - 1, 2), :]
            ra.append(pr[0:1])
            rb.append(pr[1:2])
            r_his.append(r_hi)
        Ha = jnp.concatenate(ra, axis=0)
        Hb = jnp.concatenate(rb, axis=0)
        base = (jnp.stack(r_his).reshape(S, 1) - 1) * LANES
        return Ha, Hb, base

    def peek(gr, win, rem):
        """Top log bits of the group's 8 streams (zero-padded near the end)
        from the register window: ONE split-gather, no loads. (A two-symbol
        variant measured SLOWER: the second canonical walk serializes
        behind the first's bit count, so the chain does not shorten.)"""
        Ha, Hb, base = win
        take = jnp.clip(rem, 0, gr["log"])
        lo_bit = gr["bitbase"] + rem - take
        byte0 = lo_bit >> 3  # (8,1)
        sh = lo_bit & 7
        pk = _gather2(Ha, Hb,
                      jnp.clip(byte0 - base, 0, 253) + jnp.minimum(lane, 2))
        w = pk[:, 0:1] | (pk[:, 1:2] << 8) | (pk[:, 2:3] << 16)
        v = _srl(w, sh) & ((1 << take) - 1)
        return v << (gr["log"] - take)

    def flush(a, i_row, tile):
        """ranks tile -> bytes via the 2-row perm lookup, store per row.
        Rows whose stream has no symbols in this tile (incl. padding
        streams with nsym=0) must not store — their out_base is shared."""
        gr = groups[a]
        idx = tile & 127
        sym = jnp.where(
            tile < 128,
            jnp.take_along_axis(gr["perm0"], idx, axis=1),
            jnp.take_along_axis(gr["perm1"], idx, axis=1),
        )
        for r in range(S):
            row = params_ref[a * S + r, A_OUTROW] + i_row

            @pl.when(i_row * 128 < params_ref[a * S + r, A_NSYM])
            def _():
                out_ref[pl.ds(row, 1), :] = sym[r : r + 1, :]

    def step(a, i, win, rem, tile):
        gr = groups[a]
        st = peek(gr, win, rem)
        rank = jnp.zeros((S, 1), I32)
        nb = jnp.zeros((S, 1), I32)
        for w in range(1, 13):
            ge = st >= gr["rs"][w]
            rank = jnp.where(
                ge, gr["cum"][w - 1] + ((st - gr["rs"][w]) >> (w - 1)), rank)
            nb = jnp.where(ge, gr["log"] + 1 - w, nb)
        tile = jnp.where(lane == (i & 127), rank, tile)
        rem = jnp.where(i < gr["nsym"], rem - nb, rem)
        return rem, tile

    def inner(o, j, c):
        rems, tiles, wins = c
        i = o * A_T + j
        n_rems, n_tiles = [], []
        # interleaved: HUFF_AG independent chains per iteration
        for a in range(HUFF_AG):
            rem, tile = step(a, i, wins[a], rems[a], tiles[a])
            n_rems.append(rem)
            n_tiles.append(tile)
        @pl.when((i & 127) == 127)
        def _():
            for a in range(HUFF_AG):
                flush(a, i >> 7, n_tiles[a])
        zt = jnp.zeros((S, LANES), I32)
        n_tiles = [jnp.where((i & 127) == 127, zt, t) for t in n_tiles]
        return (tuple(n_rems), tuple(n_tiles), wins)

    def outer(o, c):
        rems, tiles, _wins = c
        wins = tuple(load_window(groups[a], rems[a]) for a in range(HUFF_AG))
        return jax.lax.fori_loop(
            0, A_T, lambda j, cc: inner(o, j, cc), (rems, tiles, wins))

    init_wins = tuple(
        load_window(groups[a], groups[a]["p"][:, A_REM : A_REM + 1])
        for a in range(HUFF_AG))
    init = (tuple(groups[a]["p"][:, A_REM : A_REM + 1] for a in range(HUFF_AG)),
            tuple(jnp.zeros((S, LANES), I32) for _ in range(HUFF_AG)),
            init_wins)
    total = ((iters + A_T - 1) // A_T) * A_T
    rems, tiles, _ = jax.lax.fori_loop(0, total // A_T, outer, init)

    # the loop's own (i&127)==127 flush already stored the final data row
    # when the rounded-up iteration count crossed its boundary (and zeroed
    # the tile); only flush here when it did not
    @pl.when(((iters & 127) != 0) & (total < ((iters >> 7) + 1) * 128))
    def _():
        for a in range(HUFF_AG):
            flush(a, iters >> 7, tiles[a])

    for a in range(HUFF_AG):
        meta_ref[0, pl.ds(a * S, S), :] = jnp.where(lane == 0, rems[a], 0)


@partial(jax.jit, static_argnames=("interpret", "out_rows"))
def huffman_decode(iters, params, src_rows, out_rows: int, interpret: bool):
    """Decode G*HUFF_AG*HUFF_SUB Huffman literal streams in one launch.

    iters: (G,) max symbols per grid step (over its HUFF_AG groups);
    params: (G*HUFF_AG*HUFF_SUB, 384) i32; src_rows: (R, 128) i32 byte rows.
    Returns (litpad bytes (out_rows,128) i32, final rem (G*AG*8,))."""
    G = iters.shape[0]
    AS = HUFF_AG * HUFF_SUB
    out, meta = pl.pallas_call(
        _huffman_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((AS, 384), lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(src_rows.shape, lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((out_rows, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, AS, LANES), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, LANES), I32),
            jax.ShapeDtypeStruct((G, AS, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(iters.astype(I32), params.astype(I32), src_rows)
    return out, meta[:, :, 0].reshape(-1)


# ======================================================== kernel C: sequences
SEQ_G = 4  # interleaved independent groups per grid step (r4)


def _fse_kernel(iters_ref, params_ref, tabs_ref, info_ref, srcw_ref,
                ll_ref, ml_ref, of_ref, meta_ref):
    g = pl.program_id(0)
    iters = iters_ref[g]
    S = SEQ_SUB
    lane = jax.lax.broadcasted_iota(I32, (S, LANES), 1)
    srcw_rows = srcw_ref.shape[0]

    llinfo = jnp.broadcast_to(info_ref[0:1, :], (S, LANES))
    mlinfo = jnp.broadcast_to(info_ref[1:2, :], (S, LANES))

    def lookup(gi, slices, st):
        """Per-sublane state-table lookup over 128-lane slices."""
        idx = st & 127
        hi = st >> 7
        out = jnp.zeros((S, 1), I32)
        for h, sl in enumerate(slices):
            v = jnp.take_along_axis(tabs_ref[gi, sl, :, :], jnp.broadcast_to(idx, (S, LANES)), axis=1)[:, 0:1]
            out = jnp.where(hi == h, v, out)
        return out

    params_g = [params_ref[gi * S : (gi + 1) * S, :] for gi in range(SEQ_G)]
    bitbase_g = [p[:, C_BITBASE : C_BITBASE + 1] for p in params_g]

    # CW iterations per window reload: one iteration consumes <= 81 bits
    # (<= 3 words), so over CW=16 iterations the 5-word fetch base moves
    # <= 41 words — a (2,128)-row word pair (256 words) anchored 124..251
    # words above its base covers the whole span. Reloading per CW kills
    # the 8 scalar row-pair loads per iteration that bound the r3 kernel
    # (same amortization as kernel A's A_T window).
    CW = 16

    def load_win(gi, rem):
        qtop = jnp.maximum((bitbase_g[gi] + rem - 82) >> 5, 0) + 4
        ra, rb, his = [], [], []
        for r in range(S):
            r_hi = jnp.clip(qtop[r, 0] >> 7, 1, srcw_rows - 1)
            pr = srcw_ref[pl.ds(r_hi - 1, 2), :]
            ra.append(pr[0:1])
            rb.append(pr[1:2])
            his.append(r_hi)
        Wa = jnp.concatenate(ra, axis=0)
        Wb = jnp.concatenate(rb, axis=0)
        wb = (jnp.stack(his).reshape(S, 1) - 1) * LANES
        return Wa, Wb, wb

    def step_g(gi, i, c, win):
        rem, lls, ofs, mls, rep0, rep1, rep2, tl, tm, to, err = c
        bitbase = bitbase_g[gi]

        le = lookup(gi, (0, 1, 2, 3), lls)
        oe = lookup(gi, (4, 5), ofs)
        me = lookup(gi, (6, 7, 8, 9), mls)
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
        Wa, Wb, wb = win
        pk = _gather2(Wa, Wb,
                      jnp.clip(qwv - wb, 0, 251) + jnp.minimum(lane, 4))
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
        nseq = params_g[gi][:, C_NSEQ : C_NSEQ + 1]
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
                row = params_ref[gi * S + r, C_OUTROW] + (i >> 7)

                @pl.when((i >> 7) * 128 < params_ref[gi * S + r, C_NSEQ])
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
    init = tuple((
        params_g[gi][:, C_REM : C_REM + 1],
        params_g[gi][:, C_LLS : C_LLS + 1],
        params_g[gi][:, C_OFS : C_OFS + 1],
        params_g[gi][:, C_MLS : C_MLS + 1],
        ones, ones * 4, ones * 8,
        zero_t, zero_t, zero_t,
        jnp.zeros((S, 1), I32),
    ) for gi in range(SEQ_G))

    def inner(o, j, cs_wins):
        cs, wins = cs_wins
        i = o * CW + j
        # interleave: one step per group — the SEQ_G chains are
        # data-independent so the scheduler overlaps them
        return (tuple(step_g(gi, i, cs[gi], wins[gi])
                      for gi in range(SEQ_G)), wins)

    def outer(o, cs):
        wins = tuple(load_win(gi, cs[gi][0]) for gi in range(SEQ_G))
        cs, _ = jax.lax.fori_loop(
            0, CW, lambda j, cw: inner(o, j, cw), (cs, wins))
        return cs

    total = ((iters + CW - 1) // CW) * CW
    out = jax.lax.fori_loop(0, total // CW, outer, init)

    for gi in range(SEQ_G):
        rem, tl, tm, to, err = (out[gi][0], out[gi][7], out[gi][8],
                                out[gi][9], out[gi][10])

        # the loop's own (i&127)==127 flush already stored (and zeroed)
        # the final data row when the CW-rounded iteration count crossed
        # its boundary; only flush here when it did not (same guard as
        # kernel A's A_T rounding)
        @pl.when(((iters & 127) != 0) & (total < ((iters >> 7) + 1) * 128))
        def _():
            for r in range(S):
                row = params_ref[gi * S + r, C_OUTROW] + (iters >> 7)

                @pl.when((iters >> 7) * 128 < params_ref[gi * S + r, C_NSEQ])
                def _():
                    ll_ref[pl.ds(row, 1), :] = tl[r : r + 1, :]
                    ml_ref[pl.ds(row, 1), :] = tm[r : r + 1, :]
                    of_ref[pl.ds(row, 1), :] = to[r : r + 1, :]

        meta_ref[0, pl.ds(gi * S, S), :] = jnp.where(
            lane == 0, rem, jnp.where(lane == 1, err, 0)
        )


@partial(jax.jit, static_argnames=("interpret", "seq_rows"))
def fse_sequences(iters, params, tabs, info, srcw_rows, seq_rows: int,
                  interpret: bool):
    """Decode G*SEQ_SUB sequences sections in one launch, SEQ_G
    interleaved groups of SEQ_SUB streams per grid step.

    iters: (G,) per-GROUP bounds (maxed per grid step in here); params:
    (G*SEQ_SUB, 128); tabs: (G, 10, SEQ_SUB, 128) FSE slices;
    info: (8, 128) [ll|ml]info const rows; srcw_rows: (Rw, 128) i32 LE words.
    Returns (ll, ml, of (seq_rows,128) i32, rem (G*8,), err (G*8,))."""
    G = iters.shape[0]
    GS_ = G // SEQ_G
    step_iters = jnp.max(iters.reshape(GS_, SEQ_G), axis=1)
    ll, ml, of, meta = pl.pallas_call(
        _fse_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GS_,),
            in_specs=[
                pl.BlockSpec((SEQ_G * SEQ_SUB, 128), lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SEQ_G, 10, SEQ_SUB, 128), lambda g, *_: (g, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(srcw_rows.shape, lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((seq_rows, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((seq_rows, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((seq_rows, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SEQ_G * SEQ_SUB, LANES), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((seq_rows, LANES), I32),
            jax.ShapeDtypeStruct((seq_rows, LANES), I32),
            jax.ShapeDtypeStruct((seq_rows, LANES), I32),
            jax.ShapeDtypeStruct((GS_, SEQ_G * SEQ_SUB, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(step_iters.astype(I32), params.astype(I32), tabs.astype(I32),
      info.astype(I32), srcw_rows)
    return (ll, ml, of, meta[:, :, 0].reshape(-1), meta[:, :, 1].reshape(-1))


# ========================================================= kernel D: execute
PIECE_HUFF, PIECE_RAW, PIECE_RLE = 0, 1, 2


def _execute_kernel(iters_ref, frames_ref, desc_ref, seq3_ref,
                    litsrc_ref, out_ref, meta_ref):
    """EXEC_SUB frames per grid step, one per sublane row of (SUB,128)
    state tiles (same vectorized-state-machine architecture as
    ops/snappy_pallas_w.py; per-frame rolls become ONE split-gather with
    per-row indices).

    Scalar-unit diet (the megakernels are bound by per-frame dynamic row
    loads): the (ll,ml,of) triples arrive ROW-INTERLEAVED in seq3 (rows
    3r,3r+1,3r+2) so one 3-row slice replaces three pair loads; the two
    block descriptors (current, next) come from one 2-row slice; huffman
    literals and raw input share ONE litsrc buffer (the host bakes the
    offset into PIECE_RAW sources)."""
    del iters_ref  # per-frame bounds live in frames_ref lane F_ITERS
    S = EXEC_SUB
    FS = EXEC_G * S  # frames per grid step
    out_rows = out_ref.shape[0] // FS - OUT_PAD_ROWS
    rows_p = out_rows + OUT_PAD_ROWS
    lane = jax.lax.broadcasted_iota(I32, (S, LANES), 1)
    zero_t = jnp.zeros((S, LANES), I32)
    zero_c = jnp.zeros((S, 1), I32)

    n_blocks_g, desc_base_g, iters_f_g = [], [], []
    for gi in range(EXEC_G):
        fr = frames_ref[gi * S : (gi + 1) * S, 0, :]  # (S, LANES)
        n_blocks_g.append(fr[:, F_NBLOCKS : F_NBLOCKS + 1])
        desc_base_g.append(fr[:, F_DESCBASE : F_DESCBASE + 1])
        iters_f_g.append(fr[:, F_ITERS : F_ITERS + 1])
    desc_rows = desc_ref.shape[0]
    seq3_rows = seq3_ref.shape[0]
    litsrc_rows = litsrc_ref.shape[0]

    def rows_of(gi, ref, row_cap, q, framed=False):
        """Per-frame (row, row+1) pair: ONE 2-row slice per frame."""
        ra, rb = [], []
        for r in range(S):
            r0 = jnp.clip(q[r, 0] >> 7, 0, row_cap - 2)
            if framed:
                r0 = r0 + rows_p * (gi * S + r)
            pr = ref[pl.ds(r0, 2), :]
            ra.append(pr[0:1])
            rb.append(pr[1:2])
        return jnp.concatenate(ra, axis=0), jnp.concatenate(rb, axis=0)

    def seq3_tile(sq):
        """(ll,ml,of) rows for each frame's seq cursor: one 3-row slice."""
        la, ma, oa = [], [], []
        for r in range(S):
            r0 = jnp.clip(sq[r, 0] >> 7, 0, seq3_rows // 3 - 1)
            t = seq3_ref[pl.ds(3 * r0, 3), :]
            la.append(t[0:1])
            ma.append(t[1:2])
            oa.append(t[2:3])
        return (jnp.concatenate(la, axis=0), jnp.concatenate(ma, axis=0),
                jnp.concatenate(oa, axis=0))

    def desc_pair(gi, b):
        """Block descriptors (current, next) of the group's S frames: one
        2-row slice each (a frame's descriptors are consecutive)."""
        cur, nxt = [], []
        for r in range(S):
            d0 = jnp.clip(desc_base_g[gi][r, 0] + b[r, 0], 0, desc_rows - 2)
            t = desc_ref[pl.ds(d0, 2), :]
            cur.append(t[0:1])
            nxt.append(t[1:2])
        return jnp.concatenate(cur, axis=0), jnp.concatenate(nxt, axis=0)

    # per-group carry (all (S,1) columns except the (S,128) tile/prev):
    #  bi: block index; si: seq index in block; op: frame out pos
    #  phase: 0 = schedule next run, 1 = literal run, 2 = match
    #  rem: bytes left in current run; litpos: literals consumed in block
    #  dist: match distance; err: sticky error flag (i32); steps
    def cond(c):
        # termination: each live frame's steps increments and is bounded by
        # its own F_ITERS, so the loop ends when every frame finishes,
        # errors, or exhausts its per-frame bound (no global clause — it
        # could cut off live frames when another hits its bound first)
        live = None
        for gi in range(EXEC_G):
            bi, err, steps = c[gi][0], c[gi][9], c[gi][10]
            lg = (bi < n_blocks_g[gi]) & (err == 0) & (steps < iters_f_g[gi])
            live = lg if live is None else (live | lg)
        return jnp.max(live.astype(I32)) > 0

    def win_env(gi, c):
        """Per-DW-window loads (r4): block descriptors + a 2-row seq3
        window. Valid while the frame stays in its block (the window
        CLOSES on a block advance) and si advances <= DW < 128 (the 6-row
        slice covers seq rows r0, r0+1)."""
        bi, si = c[0], c[1]
        drow, drow_next = desc_pair(gi, bi)
        sq = drow[:, D_SEQROW : D_SEQROW + 1] * LANES + si
        rows, r0s = [], []
        for r in range(S):
            r0 = jnp.clip(sq[r, 0] >> 7, 0, seq3_rows // 3 - 2)
            rows.append(seq3_ref[pl.ds(3 * r0, 6), :])
            r0s.append(r0)
        six = [jnp.concatenate([t[k : k + 1] for t in rows], axis=0)
               for k in range(6)]
        r0 = jnp.stack(r0s).reshape(S, 1)
        open_ = jnp.ones((S, 1), jnp.bool_)
        return [drow, drow_next, six, r0, open_]

    def step_g(gi, c, env):
        (bi, si, op, phase, rem, litpos, dist, tile, prev, err, steps) = c
        drow, drow_next, six, r0, open_ = env
        n_blocks, iters_f = n_blocks_g[gi], iters_f_g[gi]
        frame_live = ((bi < n_blocks) & (err == 0) & (steps < iters_f)
                      & open_)

        n_seq = drow[:, D_NSEQ : D_NSEQ + 1]
        lit_total = drow[:, D_LITTOTAL : D_LITTOTAL + 1]

        # ---- phase 0: schedule the next run (seq literal, match, or tail)
        need = (phase == 0) & frame_live
        in_seqs = si < n_seq
        sq = drow[:, D_SEQROW : D_SEQROW + 1] * LANES + si
        hi_b = jnp.broadcast_to((sq >> 7) > r0, (S, LANES))
        LLa = jnp.where(hi_b, six[3], six[0])
        MLa = jnp.where(hi_b, six[4], six[1])
        OFa = jnp.where(hi_b, six[5], six[2])
        s_lane = si & 127
        # NOTE: indices must be full-width — Mosaic's gather lowering
        # rejects (S,1) indices against an (S,128) input
        s_lane_b = jnp.broadcast_to(s_lane, (S, LANES))
        ll = jnp.where(
            in_seqs, jnp.take_along_axis(LLa, s_lane_b, axis=1)[:, 0:1], 0)
        ml = jnp.where(
            in_seqs, jnp.take_along_axis(MLa, s_lane_b, axis=1)[:, 0:1], 0)
        of = jnp.where(
            in_seqs, jnp.take_along_axis(OFa, s_lane_b, axis=1)[:, 0:1], 0)
        tail = jnp.where(in_seqs, 0, lit_total - litpos)

        lit_n = jnp.where(in_seqs, ll, tail)
        go_lit = need & (lit_n > 0)
        go_match = need & in_seqs & (lit_n <= 0)
        m_phase = jnp.where(go_lit, 1, jnp.where(go_match, 2, phase))
        m_rem = jnp.where(go_lit, lit_n, jnp.where(go_match, ml, rem))
        m_dist = jnp.where(go_match, of, dist)
        # block advance: no seqs left and no tail
        adv_block = need & (~in_seqs) & (tail <= 0)
        n_bi = jnp.where(adv_block, bi + 1, bi)
        n_si = jnp.where(adv_block, 0, si)
        n_litpos = jnp.where(adv_block, 0, litpos)

        err_n = err | (need & in_seqs & (
            (ml < 0) | (ll < 0)
            | (litpos + jnp.clip(ll, 0, 1 << 24) > lit_total))).astype(I32)

        # ---- emit one <=128-byte window of the current run per frame
        o = op & 127
        is_lit = (m_phase == 1) & frame_live
        is_match = (m_phase == 2) & frame_live
        active = (is_lit | is_match) & (m_rem > 0) & (~adv_block)
        err_n = err_n | (is_match & active
                         & ((m_dist <= 0) | (m_dist > op))).astype(I32)

        # piece lookup for literals (pieces have strictly increasing ends)
        ndrow = jnp.where(
            jnp.broadcast_to(adv_block, (S, LANES)), drow_next, drow)
        pend = zero_c
        pprev = zero_c
        pkind = zero_c
        psrc = zero_c
        found = zero_c > 0
        prev_k = zero_c
        for k in range(4):
            e_k = ndrow[:, D_PEND + k : D_PEND + k + 1]
            sel = (~found) & (n_litpos < e_k)
            pend = jnp.where(sel, e_k, pend)
            pprev = jnp.where(sel, prev_k, pprev)
            pkind = jnp.where(sel, ndrow[:, D_PKIND + k : D_PKIND + k + 1], pkind)
            psrc = jnp.where(sel, ndrow[:, D_PSRC + k : D_PSRC + k + 1], psrc)
            found = found | sel
            prev_k = e_k

        take = jnp.minimum(m_rem, 128 - o)
        take = jnp.where(is_lit, jnp.minimum(take, pend - n_litpos), take)
        take = jnp.where(is_match, jnp.minimum(take, m_dist), take)
        take = jnp.minimum(take, jnp.maximum(out_rows * LANES - op, 0))
        err_n = err_n | (is_lit & active & ~found).astype(I32)
        take = jnp.where(active & (err_n == 0), jnp.maximum(take, 0), 0)

        # window source: near match = register pair (prev|tile); far match =
        # out pair at op-dist; literal = lit/src pair at the piece cursor
        # (RLE fills with psrc). All pairs are loaded UNCONDITIONALLY and
        # selected — per-frame branches cost more than the loads they skip
        # (measured on the snappy megakernel).
        near = is_match & (m_dist <= o + 127)
        q_far = jnp.where(is_match, op - m_dist, psrc + (n_litpos - pprev))
        q_far = jnp.where(is_match | is_lit, q_far, zero_c)
        Oa, Ob = rows_of(gi, out_ref, out_rows, q_far, framed=True)
        La, Lb = rows_of(gi, litsrc_ref, litsrc_rows, q_far)
        use_piece = is_lit & (pkind != PIECE_RLE)
        is_rle = is_lit & (pkind == PIECE_RLE)
        src_a = jnp.where(use_piece, La, Oa)
        src_b = jnp.where(use_piece, Lb, Ob)
        near_b = jnp.broadcast_to(near, (S, LANES))
        src_a = jnp.where(near_b, prev, src_a)
        src_b = jnp.where(near_b, tile, src_b)
        idx = jnp.where(near, lane + 128 - m_dist, (q_far & 127) + lane - o)
        placed = _gather2(src_a, src_b, idx & 255)
        placed = jnp.where(jnp.broadcast_to(is_rle, (S, LANES)), psrc, placed)

        mask = (lane >= o) & (lane < o + take)
        n_tile = jnp.where(mask, placed, tile)
        n_op = op + take
        crossed = ((n_op & 127) == 0) & (take > 0)
        # unconditional store into the padded per-frame region (a per-frame
        # pl.when branch costs more than the store it skips, measured on the
        # snappy kernel); far reads only select rows strictly below the
        # current window, so a partial row is never observed
        for r in range(S):
            row = jnp.minimum(op[r, 0] >> 7, rows_p - 1)
            out_ref[pl.ds((gi * S + r) * rows_p + row, 1), :] = (
                n_tile[r : r + 1, :])

        n_prev = jnp.where(crossed, n_tile, prev)
        n_tile = jnp.where(crossed, zero_t, n_tile)

        n_rem = m_rem - take
        n_litpos = jnp.where(is_lit & active, n_litpos + take, n_litpos)
        n_dist = jnp.where(
            is_match & (take == m_dist) & (take > 0),
            jnp.minimum(m_dist * 2, 1 << 24), m_dist)

        # run finished: seq literal -> its match (or next seq if ml==0);
        # match -> next seq; tail -> next block
        fin = active & (n_rem == 0)
        fin_seq_lit = fin & is_lit & in_seqs
        fin_tail = fin & is_lit & (~in_seqs)
        fin_match = fin & is_match
        n_phase = jnp.where(fin_seq_lit & (ml > 0), 2, jnp.where(fin, 0, m_phase))
        n_phase = jnp.where(adv_block, 0, n_phase)
        n_rem = jnp.where(fin_seq_lit & (ml > 0), ml, n_rem)
        n_dist = jnp.where(fin_seq_lit & (ml > 0), of, n_dist)
        n_si = jnp.where(fin_match | (fin_seq_lit & (ml <= 0)), n_si + 1, n_si)
        n_bi = jnp.where(fin_tail, n_bi + 1, n_bi)
        n_si = jnp.where(fin_tail, 0, n_si)
        n_litpos = jnp.where(fin_tail, 0, n_litpos)

        err_n = err_n | (active & (take <= 0)).astype(I32)
        n_steps = jnp.where(frame_live, steps + 1, steps)
        # close the window on a block advance: the env's descriptors only
        # cover blocks bi and bi+1 (the frame stalls until the reload)
        n_open = open_ & ~adv_block & ~fin_tail
        return (n_bi, n_si, n_op, n_phase, n_rem, n_litpos, n_dist,
                n_tile, n_prev, err_n, n_steps), n_open

    DW = 8  # iterations per desc/seq3 window reload

    def body(c):
        # interleave: one step per group per unrolled iteration — the
        # EXEC_G chains are data-independent so the scheduler overlaps them
        envs = [win_env(gi, c[gi]) for gi in range(EXEC_G)]
        cs = list(c)
        for _ in range(DW):
            for gi in range(EXEC_G):
                cs[gi], n_open = step_g(gi, cs[gi], envs[gi])
                envs[gi][4] = n_open
        return tuple(cs)

    init_g = (zero_c, zero_c, zero_c, zero_c, zero_c, zero_c, zero_c + 1,
              zero_t, zero_t, zero_c, zero_c)
    init = tuple(init_g for _ in range(EXEC_G))
    # the cond's live-reduction is a vector->scalar pipeline drain; check
    # it only every M bodies (finished frames no-op harmlessly — their
    # steps stop at iters_f so the per-frame bound still holds)
    M = 4

    def outer_body(c):
        return jax.lax.fori_loop(0, M, lambda _, cc: body(cc), c)

    out = jax.lax.while_loop(cond, outer_body, init)
    for gi in range(EXEC_G):
        bi, op, err, steps = out[gi][0], out[gi][2], out[gi][9], out[gi][10]
        ok = (err == 0) & (bi >= n_blocks_g[gi])
        meta_ref[0, pl.ds(gi * S, S), :] = jnp.where(
            lane == 0, jnp.where(ok, op, -1),
            jnp.where(lane == 1, ok.astype(I32),
                      jnp.where(lane == 2, steps, 0)))


@partial(jax.jit, static_argnames=("interpret", "out_rows_per_frame"))
def execute(iters, frames, desc, seq3, litsrc,
            out_rows_per_frame: int, interpret: bool):
    """Execute all frames' sequences in one launch, EXEC_G*EXEC_SUB frames
    per grid step (EXEC_G interleaved groups of EXEC_SUB sublane rows).

    iters: (G,) per-step iteration bounds (G = F/(EXEC_G*EXEC_SUB));
    frames: (F,128) — lane F_ITERS carries each frame's own bound; desc:
    (BD,128) block descriptors; seq3: (3*S,128) row-interleaved (ll,ml,of)
    triples; litsrc: (L+R,128) huffman-literal bytes then raw input bytes
    (PIECE_RAW sources carry the offset). Returns
    (out (F*(out_rows+PAD),128) u8, out_len (F,), ok (F,))."""
    F = frames.shape[0]
    FS = EXEC_G * EXEC_SUB
    G = F // FS
    rows_p = out_rows_per_frame + OUT_PAD_ROWS
    out, meta = pl.pallas_call(
        _execute_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((FS, 1, LANES), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(desc.shape, lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(seq3.shape, lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(litsrc.shape, lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((FS * rows_p, LANES), lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, FS, LANES), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F * rows_p, LANES), I32),
            jax.ShapeDtypeStruct((G, FS, LANES), I32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(iters.astype(I32), frames.astype(I32).reshape(F, 1, LANES),
      desc.astype(I32), seq3, litsrc)
    meta2 = meta.reshape(F, LANES)
    out_len = meta2[:, 0]
    ok = meta2[:, 1] > 0
    # uint8 on device: the caller offloads `out` to the host — casting in
    # the same program quarters the device->host transfer
    return out.astype(jnp.uint8), out_len, ok
