"""Deflate (raw RFC 1951) decode — unified-buffer Pallas megakernel.

The TPU analogue of the reference's native inflate binding
(deflate/DeflateNative.java:28-40, libdeflate_deflate_decompress), closing
SURVEY §2.8's last device-tier row. Split of labor mirrors the zstd tier:
the host planner (native/src/inflate.cc via deflate/device_prep.py) builds
per-chunk two-level canonical Huffman LUT pages and the block plan (deflate
block boundaries are only discoverable by symbol decode); this kernel then
performs the COMPLETE entropy decode — every literal/length/distance symbol
is re-derived from the raw bitstream via the LUTs — plus the LZ77 execution,
on device.

Architecture is the shared decode-megakernel design (ops/snappy_pallas_w.py,
ops/lzo_pallas_w.py): unified [input|output] VMEM address space per chunk,
G interleaved chunk groups, a 256-byte bit window per body, scratch-column
scalar extracts, and the r4 two-register emission engine with crossing
continuation. Deflate adds a second operand — the per-chunk table page —
read with one dynamic row load per LUT level.

Phase machine per chunk:
  0 NEWBLK  read the next block descriptor (stored -> literal run launch;
            huffman -> install table bases + data bitpos)
  1 SYM     one litlen symbol: LITERAL (immediate byte emit), LENGTH
            (+extra bits -> DIST), or END-OF-BLOCK (-> NEWBLK/DONE)
  2 DIST    the distance code + extra bits -> LZ77 copy launch
  3 DONE    terminal
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

PH_NEWBLK, PH_SYM, PH_DIST, PH_DONE = 0, 1, 2, 3
FROM_COPY, FROM_LIT, FROM_IMM = 0, 1, 2
OP_LIT, OP_LEN, OP_DIST, OP_EOB, OP_SUB = 1, 2, 3, 4, 5
ROOTB = 9
MAX_BLOCKS = 16


def _rep(x):
    return jnp.broadcast_to(x, (SUBG, LANES))


def _decode_kernel(lens_ref, in_ref, tab_ref, uni_ref, meta_ref, *scr_refs):
    g0 = pl.program_id(0)
    Rc = in_ref.shape[0] // SUB
    TR = tab_ref.shape[0] // SUB
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

    clen_g, desc_g, init_g = [], [], []
    for gi in range(G):
        clen = _rep(jnp.stack(
            [lens_ref[g0 * SUB + gi * SUBG + r] for r in range(SUBG)]
        ).reshape(SUBG, 1))
        clen_g.append(clen)
        # the descriptor row is entry 0..127 of each chunk's page (static row)
        desc_g.append(jnp.concatenate(
            [tab_ref[pl.ds((gi * SUBG + r) * TR, 1), :] for r in range(SUBG)],
            axis=0))
        err0 = ((clen <= 0) | (clen > Rc * LANES)).astype(I32)
        init_g.append((zero, zero, zero, zero, zero, zero, zero, zero,
                       zero, zero, zero, zero, err0, zero, zero))

    # carry: bitpos, op, rem, src, from_inp, dist, phase, blk, llb, dbb,
    #        plen, blast, err, tileA, tileB
    def cond(c):
        steps = c[0]
        live = jnp.int32(0)
        for gi in range(G):
            st = c[1][gi]
            rem, phase, err = st[2], st[6], st[12]
            more = (rem[:, 0:1] > 0) | (phase[:, 0:1] != PH_DONE)
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

    def tab_load(gi, eidx):
        """One dynamic row load per chunk from its table page; returns the
        entry value at eidx (entry index within the page)."""
        scr_refs[gi][...] = eidx >> 7
        rows = []
        for r in range(SUBG):
            c = gi * SUBG + r
            rr = jnp.clip(scr_refs[gi][r, 0], 0, TR - 1)
            rows.append(tab_ref[pl.ds(c * TR + rr, 1), :])
        Ta = jnp.concatenate(rows, axis=0)
        idx = jnp.broadcast_to(eidx[:, 0:1] & 127, (SUBG, LANES))
        return jnp.take_along_axis(Ta, idx, axis=1)

    def dfield(gi, blk, f):
        idx = jnp.broadcast_to(
            jnp.clip(blk[:, 0:1] * 8 + f, 0, 127), (SUBG, LANES))
        return jnp.take_along_axis(desc_g[gi], idx, axis=1)

    def token_step(gi, st, env):
        (bitpos, op, rem, src, from_inp, dist, phase, blk, llb, dbb,
         plen, blast, err, tileA, tileB) = st
        Ha, Hb, hbase, wrow0, open_ = env
        clen = clen_g[gi]
        cbits = clen << 3

        active = (err == 0) & ((rem > 0) | (phase != PH_DONE)) & open_
        need = (rem == 0) & active & (phase != PH_DONE)
        bp3 = bitpos >> 3
        needs_bits = need & (phase != PH_NEWBLK)
        stall = needs_bits & (bp3 + 8 > hbase + 2 * LANES)
        parse = need & ~stall

        # 31-bit LSB-first window at bitpos (4 bytes; sh + 15 + 13 <= 27)
        def w31(at):
            hs = (at >> 3) - hbase
            pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 3))
            b0 = _rep(pk[:, 0:1])
            b1 = _rep(pk[:, 1:2])
            b2 = _rep(pk[:, 2:3])
            b3 = _rep(pk[:, 3:4])
            return b0 | (b1 << 8) | (b2 << 16) | ((b3 & 127) << 24)

        peek = (w31(bitpos) >> (bitpos & 7)) & 0x7FFF

        # ---- two-level LUT lookup (litlen in SYM, dist in DIST)
        base = jnp.where(phase == PH_DIST, dbb, llb)
        e1 = tab_load(gi, base + (peek & (2 ** ROOTB - 1)))
        op1 = e1 >> 28
        sb1 = (e1 >> 22) & 63
        sidx = (e1 & 0x3FFFFF) + ((peek >> ROOTB) &
                                  ((jnp.int32(1) << sb1) - 1))
        e2 = tab_load(gi, sidx)
        e = jnp.where(op1 == OP_SUB, e2, e1)
        eop = e >> 28
        ebits = (e >> 22) & 63
        eval_ = e & 0x3FFFFF

        bitpos1 = bitpos + ebits
        # extra bits immediately after the code (len<=5 or dist<=13 bits)
        extra = jnp.where(eop == OP_LEN, eval_ >> 9,
                          jnp.where(eop == OP_DIST, eval_ >> 16, 0))
        ext = (w31(bitpos1) >> (bitpos1 & 7)) & ((jnp.int32(1) << extra) - 1)
        bitpos2 = bitpos1 + extra

        # ---- phase SYM
        s_lit = eop == OP_LIT
        s_eob = eop == OP_EOB
        s_len = eop == OP_LEN
        s_bad = (eop == 0) | (eop == OP_SUB) | (eop == OP_DIST) | (ebits == 0)
        sym_len = (eval_ & 511) + ext

        # ---- phase DIST
        d_ok = eop == OP_DIST
        d_dist = (eval_ & 0xFFFF) + ext

        # ---- phase NEWBLK (descriptor-driven; no bit window needed)
        n_over = blk >= MAX_BLOCKS
        bt = dfield(gi, blk, 0)
        bpos = dfield(gi, blk, 1)
        bll = dfield(gi, blk, 2)
        bdd = dfield(gi, blk, 3)
        soff = dfield(gi, blk, 4)
        slen = dfield(gi, blk, 5)
        bfin = dfield(gi, blk, 6)
        nb_stored = bt == 0

        # ---- merge by phase
        ph_nb = parse & (phase == PH_NEWBLK)
        ph_sym = parse & (phase == PH_SYM)
        ph_ds = parse & (phase == PH_DIST)

        launch_imm = ph_sym & s_lit
        launch_lit = ph_nb & nb_stored & ~n_over
        launch_cpy = ph_ds & d_ok

        p_rem = jnp.where(launch_imm, 1,
                          jnp.where(launch_lit, slen,
                                    jnp.where(launch_cpy, plen, 0)))
        n_src = jnp.where(launch_imm, eval_,
                          jnp.where(launch_lit, soff, src))
        n_from = jnp.where(launch_imm, FROM_IMM,
                           jnp.where(launch_lit, FROM_LIT,
                                     jnp.where(launch_cpy, FROM_COPY,
                                               from_inp)))
        n_dist = jnp.where(launch_cpy, d_dist, dist)
        n_phase = jnp.where(
            ph_nb, jnp.where(nb_stored,
                             jnp.where(bfin > 0, PH_DONE, PH_NEWBLK),
                             PH_SYM),
            jnp.where(ph_sym & s_eob,
                      jnp.where(blast > 0, PH_DONE, PH_NEWBLK),
                      jnp.where(ph_ds, PH_SYM,
                                jnp.where(ph_sym & s_len, PH_DIST, phase))))
        # blk advances once per block: NEWBLK consumes desc[blk]; a huffman
        # block's EOB routes back to NEWBLK which then reads the next one
        n_blk = jnp.where(ph_nb, blk + 1, blk)
        n_llb = jnp.where(ph_nb & ~nb_stored, bll, llb)
        n_dbb = jnp.where(ph_nb & ~nb_stored, bdd, dbb)
        n_blast = jnp.where(ph_nb & ~nb_stored, bfin, blast)
        n_plen = jnp.where(ph_sym & s_len, sym_len, plen)
        n_bitpos = jnp.where(
            ph_nb & ~nb_stored, bpos,
            jnp.where(ph_sym | ph_ds, bitpos2, bitpos))

        p_err = (
            (ph_nb & n_over)
            | (ph_nb & nb_stored & ((soff < 0) | (soff + slen > clen)
                                    | (slen < 0)))
            | (ph_sym & s_bad)
            | (ph_ds & (~d_ok | (ebits == 0)))
            | (launch_cpy & ((n_dist <= 0) | (n_dist > op)))
            | ((ph_sym | ph_ds) & (n_bitpos > cbits))
            | (parse & (p_rem > MAX_OUT))
            | (parse & (op + jnp.clip(p_rem, 0, MAX_OUT) > MAX_OUT)))
        err = err | p_err.astype(I32)

        rem = jnp.where(parse, jnp.where(
            launch_imm | launch_lit | launch_cpy, p_rem, rem), rem)
        src = jnp.where(parse, n_src, src)
        from_inp = jnp.where(parse, n_from, from_inp)
        dist = jnp.where(parse, n_dist, dist)
        bitpos = jnp.where(parse, n_bitpos, bitpos)
        phase = jnp.where(parse, n_phase, phase)
        blk = jnp.where(parse, n_blk, blk)
        llb = jnp.where(parse, n_llb, llb)
        dbb = jnp.where(parse, n_dbb, dbb)
        plen = jnp.where(parse, n_plen, plen)
        blast = jnp.where(parse, n_blast, blast)
        open_ = open_ & ~stall & ~(err > 0)

        # ---- emit (shared r4 engine: two-register window with crossing
        # continuation, see ops/snappy_pallas_w.py; FROM_IMM emits the
        # decoded literal byte carried in src)
        o = op & 127
        cwrow = op >> 7
        emit = open_ & (rem > 0) & active
        is_copy = emit & (from_inp == FROM_COPY)
        is_imm = emit & (from_inp == FROM_IMM)
        take = jnp.minimum(rem, 128 - o)
        second = cwrow > wrow0
        take = jnp.where(second, jnp.minimum(take, 127 - o), take)
        take = jnp.where(is_copy, jnp.minimum(take, dist), take)
        take = jnp.where(emit, take, 0)

        q = jnp.where(is_copy, OUTBASE + op - dist,
                      jnp.where(is_imm, 0, src))
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
        is_imm_b = jnp.broadcast_to(is_imm[:, 0:1], (SUBG, LANES))
        value = jnp.where(is_imm_b, jnp.broadcast_to(src[:, 0:1] & 255,
                                                     (SUBG, LANES)), value)

        mask = (lane >= o) & (lane < o + take)
        tileA = jnp.where(mask, value, tileA)
        op = op + take
        rem = rem - take
        src = jnp.where(from_inp == FROM_LIT, src + take, src)
        dist = jnp.where(
            is_copy & (take == dist) & (rem > 0),
            jnp.minimum(dist * 2, MAX_OUT), dist)
        crossed = ((op & 127) == 0) & (take > 0)
        crossed_b = jnp.broadcast_to(crossed[:, 0:1], (SUBG, LANES))
        tileB = jnp.where(crossed_b, tileA, tileB)
        tileA = jnp.where(crossed_b, zero, tileA)
        open_ = open_ & ~(second & ((op & 127) == 127) & (rem > 0))

        return (bitpos, op, rem, src, from_inp, dist, phase, blk, llb, dbb,
                plen, blast, err, tileA, tileB), open_

    def body(c):
        steps, states = c
        envs = []
        for gi in range(G):
            bitpos, op = states[gi][0], states[gi][1]
            wrow0 = op >> 7
            hrow = (bitpos >> 3) >> 7
            Ha, Hb = hdr_load(gi, hrow)
            hbase = jnp.maximum(jnp.minimum(hrow, Rc - 2), 0) << 7
            open_ = jnp.ones((SUBG, LANES), jnp.bool_)
            envs.append([Ha, Hb, hbase, wrow0, open_])
        sts = list(states)
        for _ in range(K):
            for gi in range(G):
                sts[gi], open_ = token_step(gi, sts[gi], envs[gi])
                envs[gi][4] = open_

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
        fr = (op >> 7) - 1
        scr_refs[gi][...] = fr
        for r in range(SUBG):
            c = gi * SUBG + r
            row = Rc + jnp.clip(scr_refs[gi][r, 0], 0, OUT_ROWSP - 1)
            uni_ref[pl.ds(c * RT + row, 1), :] = tileB[r : r + 1, :]
            rowa = Rc + jnp.clip(scr_refs[gi][r, 0] + 1, 0, OUT_ROWSP - 1)
            uni_ref[pl.ds(c * RT + rowa, 1), :] = tileA[r : r + 1, :]
        ok = (err == 0) & (rem == 0) & (phase == PH_DONE)
        lane = jax.lax.broadcasted_iota(I32, (SUBG, LANES), 1)
        meta_ref[pl.ds(gi * SUBG, SUBG), :] = jnp.where(
            lane == 0, op,
            jnp.where(lane == 1, ok.astype(I32),
                      jnp.where(lane == 2,
                                _rep(jnp.full((SUBG, 1), steps, I32)), 0)))


@partial(jax.jit, static_argnames=("interpret",))
def _decode_impl(comp, comp_lens, pages, interpret: bool):
    B, Lc = comp.shape
    Rc = Lc // LANES
    RT = Rc + OUT_ROWSP
    TRL = pages.shape[1]
    TR = TRL // LANES
    rows = comp.astype(I32).reshape(B * Rc, LANES)
    tab_rows = pages.reshape(B * TR, LANES)
    NG = B // SUB
    uni_rows, meta = pl.pallas_call(
        _decode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NG,),
            in_specs=[
                pl.BlockSpec((SUB * Rc, LANES), lambda g, *_: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB * TR, LANES), lambda g, *_: (g, 0),
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
            vmem_limit_bytes=110 * 1024 * 1024),
    )(comp_lens.astype(I32), rows, tab_rows)
    out_lens = meta[:, 0]
    ok = meta[:, 1] > 0
    steps = meta[:, 2]
    out = uni_rows.reshape(B, RT * LANES)[:, Rc * LANES : Rc * LANES + MAX_OUT]
    j = jnp.arange(MAX_OUT, dtype=I32)[None, :]
    out = jnp.where(j < out_lens[:, None], out, 0).astype(jnp.uint8)
    return out, out_lens, ok, steps


# minimal valid raw-deflate stream for batch padding: final stored empty
_PAD_BLOB = bytes([0x01, 0x00, 0x00, 0xFF, 0xFF])
# its plan: one stored block, len 0, final (no planner call needed)
_PAD_DESC = np.zeros(128, np.int32)
_PAD_DESC[4] = 4  # stored data starts after the 4 header bytes
_PAD_DESC[6] = 1  # final


def decode_staged(comp, comp_lens, pages):
    """Sustained-protocol entry: `comp` (B, Lc) / `pages` (B, TR*128) may
    already live on device; B must be a SUB multiple and Lc must carry
    >=1024 bytes of zero slack past every chunk (the bench's staging
    contract — avoids the host round-trip decode() pays for padding)."""
    B, Lc = comp.shape
    assert B % SUB == 0 and Lc % LANES == 0
    interpret = jax.default_backend() != "tpu"
    return _decode_impl(comp, comp_lens, pages, interpret)


def decode(comp, comp_lens, pages, out_cap: int = MAX_OUT,
           with_steps: bool = False):
    """Decode B raw-deflate chunks (<=64KB decompressed each) with their
    planner pages ((B, TR*128) int32, deflate/device_prep.pack_pages),
    ONE kernel launch."""
    assert out_cap <= MAX_OUT
    comp = np.asarray(comp)
    comp_lens = np.asarray(comp_lens)
    pages = np.asarray(pages)
    B, Lc = comp.shape
    pad_b = (-B) % SUB
    if pad_b:
        pad = np.zeros((pad_b, Lc), np.uint8)
        pad[:, : len(_PAD_BLOB)] = np.frombuffer(_PAD_BLOB, np.uint8)
        comp = np.concatenate([comp, pad], axis=0)
        comp_lens = np.concatenate(
            [comp_lens, np.full((pad_b,), len(_PAD_BLOB), comp_lens.dtype)])
        pp = np.zeros((pad_b, pages.shape[1]), np.int32)
        pp[:, :128] = _PAD_DESC
        pages = np.concatenate([pages, pp], axis=0)
    comp = np.pad(comp, ((0, 0), (0, 1024 + (-Lc) % 1024)))
    interpret = jax.default_backend() != "tpu"
    out, out_lens, ok, steps = _decode_impl(
        jnp.asarray(comp), jnp.asarray(comp_lens), jnp.asarray(pages),
        interpret)
    if pad_b:
        out, out_lens, ok, steps = out[:B], out_lens[:B], ok[:B], steps[:B]
    ok = ok & (out_lens <= MAX_OUT)
    if out_cap != MAX_OUT:
        out = out[:, :out_cap]
        ok = ok & (out_lens <= out_cap)
    if with_steps:
        return out, out_lens, ok, steps
    return out, out_lens, ok
