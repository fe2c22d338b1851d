"""Snappy block decode — single-launch Pallas TPU megakernel.

Format parity: reference snappy/SnappyRawDecompressor.java:30-220 (varint
length, tag dispatch, strict validation). One ``pallas_call`` decodes a whole
(B, 64KB) batch: the grid walks chunks; each grid step runs a merged
parse+emit state machine over its chunk.

Cost model (measured on this chip): a ``lax.while_loop`` iteration has a
~143ns floor under which loads, stores, and plain vector ops hide almost
completely; the only primitive that sticks out is a lane rotate
(``pltpu.roll``, ~74ns static or dynamic). The kernel is therefore shaped to
execute exactly TWO rolls per iteration:

- token headers are extracted from the raw (unrotated) input rows with
  lane-compare reductions — free vector work, no alignment roll;
- the source window (literal bytes or copy source) is loaded as a raw row
  pair and rotated DIRECTLY into its output-tile position: the alignment
  rotate and the placement rotate fuse into one roll per row
  (roll(row, (o - src_lane) mod 128)), with the row_a/row_b seam handled by
  a lane select;
- literal vs copy source construction sits under a scalar ``lax.cond`` so
  only one path's rolls execute per iteration.

The output keeps the current and previous 128-byte tiles in registers:
copies with dist ≤ o+127 are served register-to-register, far copies read
flushed VMEM rows (safe: dist ≥ o+128 puts the whole source below the write
row, and rows are flushed exactly once, on tile crossing).

A typical (≤128-byte) token costs ONE loop iteration.

Layout contract: bytes are carried as int32 (Mosaic has no i8 vector ops) in
(rows, 128) tiles — byte p of chunk b lives at [b*R + (p >> 7), p & 127].
The wrapper packs/unpacks around the kernel (one cheap fused XLA pass each).

Overlapping copies (dist < len) replicate their period by capping each emit
window at the current distance and letting the effective distance double as
output accrues (log2(len) windows resolve any overlap run).
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
OUT_ROWS = 512  # 64KB output per chunk
MAX_OUT = OUT_ROWS * LANES


def _decode_kernel(lens_ref, in_ref, out_ref, meta_ref):
    b = pl.program_id(0)
    clen = lens_ref[b]
    in_rows = in_ref.shape[0]
    lane = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
    zero_tile = jnp.zeros((1, LANES), I32)

    def load_pair(ref, row_cap, pos):
        r = pos >> 7
        r0 = jnp.clip(r, 0, row_cap - 1)
        r1 = jnp.clip(r + 1, 0, row_cap - 1)
        return ref[pl.ds(r0, 1), :], ref[pl.ds(r1, 1), :]

    def place(row_a, row_b, src_lane, o):
        """Rotate a raw row pair so lane o+m holds byte m of the source
        (source starts at lane ``src_lane`` of row_a). ONE roll per row."""
        rot = (o - src_lane) & 127
        a = pltpu.roll(row_a, rot, 1)
        bb = pltpu.roll(row_b, rot, 1)
        return jnp.where(lane < o + 128 - src_lane, a, bb)

    def peek(row_a, row_b, s, k):
        """Byte s+k of a raw row pair as a scalar via lane-compare reduce."""
        sk = s + k
        row = jnp.where(sk < 128, row_a, row_b)
        return jnp.sum(jnp.where(lane == (sk & 127), row, 0))

    # ---- varint uncompressed length (≤5 bytes; reference readUncompressedLength)
    v0 = in_ref[0, 0]
    v1 = in_ref[0, 1]
    v2 = in_ref[0, 2]
    v3 = in_ref[0, 3]
    v4 = in_ref[0, 4]
    declared = v0 & 0x7F
    vlen = jnp.int32(1)
    carry = v0 >= 128
    for k, vk in ((1, v1), (2, v2), (3, v3), (4, v4)):
        declared = jnp.where(carry, declared | ((vk & 0x7F) << (7 * k)), declared)
        vlen = vlen + carry.astype(I32)
        if k < 4:
            carry = carry & (vk >= 128)
    err0 = (declared > MAX_OUT) | (vlen > clen) | (clen > in_rows * LANES)

    # ---- merged parse+emit state machine
    # carry: ip, op, rem, src, from_input, dist, err, steps, tile, prev
    #   rem > 0  → a run (literal or copy) is in flight
    #   src      → input position of the next literal byte (literal runs)
    #   dist     → effective copy distance (copies; doubles as overlap resolves)
    #   tile/prev → current and previous 128-byte output rows (registers)
    def cond(c):
        ip, op, rem = c[0], c[1], c[2]
        err, steps = c[6], c[7]
        more = (rem > 0) | (ip < clen)
        return (~err) & more & (steps < 2 * MAX_OUT)

    def body(c):
        ip, op, rem, src, from_inp, dist, err, steps, tile, prev = c
        need = rem == 0  # parse a new token this iteration?

        # ---- parse (header bytes via reductions on the raw row pair; no roll)
        ha, hb = load_pair(in_ref, in_rows, ip)
        hs = ip & 127
        tag = peek(ha, hb, hs, 0)
        b1 = peek(ha, hb, hs, 1)
        b2 = peek(ha, hb, hs, 2)
        b3 = peek(ha, hb, hs, 3)
        b4 = peek(ha, hb, hs, 4)
        ttype = tag & 3
        n = tag >> 2
        # literal params
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
        # copy params
        c1_len = 4 + ((tag >> 2) & 7)
        c1_dist = ((tag >> 5) << 8) | b1
        c2_len = n + 1
        c2_dist = b1 | (b2 << 8)
        c4_dist = b1 | (b2 << 8) | (b3 << 16)
        cp_len = jnp.where(ttype == 1, c1_len, c2_len)
        cp_dist = jnp.where(
            ttype == 1, c1_dist, jnp.where(ttype == 2, c2_dist, c4_dist)
        )
        tok_size = jnp.where(
            is_lit_tok,
            1 + lit_extra,
            jnp.where(ttype == 1, 2, jnp.where(ttype == 2, 3, 5)),
        )
        p_rem = jnp.where(is_lit_tok, ext, cp_len)
        # reject out-of-range run lengths FIRST (4-byte extensions can wrap
        # int32; a wrapped p_rem must never reach the emit address math)
        p_err = (
            (p_rem < 0)
            | (p_rem > MAX_OUT)
            | (ip + tok_size > clen)
            | (is_lit_tok & (ip + tok_size + jnp.clip(ext, 0, MAX_OUT) > clen))
            | (op + jnp.clip(p_rem, 0, MAX_OUT) > declared)
            | (~is_lit_tok) & ((cp_dist <= 0) | (cp_dist > op))
            | ((ttype == 3) & (b4 != 0))
        )

        # merge parse results into the run state
        m_rem = jnp.where(need, p_rem, rem)
        m_src = jnp.where(need, ip + tok_size, src)
        m_dist = jnp.where(need, jnp.where(is_lit_tok, jnp.int32(MAX_OUT), cp_dist), dist)
        m_from = jnp.where(need, is_lit_tok.astype(I32), from_inp)
        m_ip = jnp.where(need, ip + tok_size + jnp.where(is_lit_tok, ext, 0), ip)
        n_err = err | (need & p_err)

        # ---- emit up to one 128-byte window of the current run
        o = op & 127
        is_copy = m_from == 0
        take = jnp.minimum(m_rem, 128 - o)
        take = jnp.where(is_copy, jnp.minimum(take, m_dist), take)
        take = jnp.where(n_err, 0, take)

        def copy_window(_):
            # near (dist ≤ o+127): source inside the (prev, tile) register
            # pair, which holds bytes [op-o-128, op-o+128)
            def near(_):
                poff = o + 128 - m_dist  # 1..255
                ra = jnp.where(poff < 128, prev, tile)
                rb = tile
                return place(ra, rb, poff & 127, o)

            # far (dist ≥ o+128): whole source window is below the write row,
            # and every row below it has been flushed
            def far(_):
                q = op - m_dist
                ra, rb = load_pair(out_ref, OUT_ROWS, q)
                return place(ra, rb, q & 127, o)

            return jax.lax.cond(m_dist > o + 127, far, near, None)

        def lit_window(_):
            q = m_src  # next literal byte (input position)
            ra, rb = load_pair(in_ref, in_rows, q)
            return place(ra, rb, q & 127, o)

        placed = jax.lax.cond(is_copy, copy_window, lit_window, None)
        mask = (lane >= o) & (lane < o + take)
        n_tile = jnp.where(mask, placed, tile)
        n_op = op + take
        crossed = ((n_op & 127) == 0) & (take > 0)

        # flush ONLY on tile crossing; the finished row becomes prev
        @pl.when(crossed)
        def _():
            out_ref[pl.ds(op >> 7, 1), :] = n_tile

        n_prev = jnp.where(crossed, n_tile, prev)
        n_tile = jnp.where(crossed, zero_tile, n_tile)
        # after writing a full D-sized batch the written suffix has period
        # D, so D may double (overlap runs resolve in log2(len) windows)
        n_dist = jnp.where(
            is_copy & (take == m_dist), jnp.minimum(m_dist * 2, MAX_OUT), m_dist
        )
        n_err = n_err | ((take <= 0) & (m_rem > 0))
        return (
            m_ip,
            n_op,
            m_rem - take,
            m_src + take,
            m_from,
            n_dist,
            n_err,
            steps + 1,
            n_tile,
            n_prev,
        )

    init = (
        vlen,
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        err0,
        jnp.int32(0),
        zero_tile,
        zero_tile,
    )
    out = jax.lax.while_loop(cond, body, init)
    ip, op, rem, err, steps, tile = out[0], out[1], out[2], out[6], out[7], out[8]

    # final partial-tile flush
    @pl.when((op & 127) != 0)
    def _():
        out_ref[pl.ds(op >> 7, 1), :] = tile

    ok = (~err) & (op == declared) & (rem == 0)
    meta_ref[0, 0:1, :] = jnp.where(
        lane == 0,
        jnp.where(ok, op, 0),
        jnp.where(lane == 1, ok.astype(I32), jnp.where(lane == 2, steps, 0)),
    )


def _pack_rows(comp_u8):
    """(B, Lc) u8 → (B*Rc, 128) i32 byte rows."""
    B, Lc = comp_u8.shape
    return comp_u8.astype(I32).reshape(B * (Lc // LANES), LANES)


@partial(jax.jit, static_argnames=("interpret",))
def _decode_impl(comp, comp_lens, interpret: bool):
    B, Lc = comp.shape
    Rc = Lc // LANES
    rows = _pack_rows(comp)
    out_rows, meta = pl.pallas_call(
        _decode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((Rc, LANES), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((OUT_ROWS, LANES), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, LANES), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * OUT_ROWS, LANES), I32),
            jax.ShapeDtypeStruct((B, 8, LANES), I32),
        ),
        interpret=interpret,
    )(comp_lens.astype(I32), rows)
    out_lens = meta[:, 0, 0]
    ok = meta[:, 0, 1] > 0
    steps = meta[:, 0, 2]
    out = out_rows.reshape(B, MAX_OUT)
    j = jnp.arange(MAX_OUT, dtype=I32)[None, :]
    out = jnp.where(j < out_lens[:, None], out, 0).astype(jnp.uint8)
    return out, out_lens, ok, steps


def decode(comp, comp_lens, out_cap: int = MAX_OUT, with_steps: bool = False):
    """Decode B snappy blocks in ONE kernel launch.

    comp: (B, Lc) uint8 zero-padded (with varint length prefix), Lc % 128 == 0;
    comp_lens: (B,) int32. Chunks must decompress to ≤ 64KB (the framing
    format's chunk bound — reference: SnappyFramedOutputStream 64KB max).
    Returns (out (B, 65536) uint8, out_lens (B,) int32, ok (B,) bool).
    """
    assert out_cap <= MAX_OUT
    B, Lc = comp.shape
    if Lc % 1024:  # block rows must be a multiple of 8 (Mosaic tiling)
        comp = jnp.pad(comp, ((0, 0), (0, 1024 - Lc % 1024)))
    interpret = jax.default_backend() != "tpu"
    out, out_lens, ok, steps = _decode_impl(comp, comp_lens, interpret)
    if out_cap != MAX_OUT:
        out = out[:, :out_cap]
        ok = ok & (out_lens <= out_cap)
    if with_steps:
        return out, out_lens, ok, steps
    return out, out_lens, ok
