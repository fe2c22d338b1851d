"""Round-4 marginal-cost ablation of ops/snappy_pallas_w.py.

Rebuilds the production kernel with a FIXED iteration count (cond -> steps <
ITERS) and section variants, times each by the SLOPE between two iteration
counts on the real chip (removes the ~25ms relay round trip and all setup).

Variants:
  base       exact production body
  noload     per-step source fetch replaced by reusing the header regs
             (removes 8 dynamic 2-row loads + 1 scr store + 8 scalar reads
             per group-step)
  noscr      scr store+scalar-readback removed from the source fetch
             (loads at a cheap statically-derived address; keeps 8 loads)
  nohdr      header load per body removed (parse from stale regs)
  noemit     emission vector chain removed (keeps loads + scr)
  nostore    flush stores removed
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
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


def _rep(x):
    return jnp.broadcast_to(x, (SUBG, LANES))


def make_kernel(variant, iters):
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

        def cond(c):
            return c[0] < iters

        def hdr_load(gi, hrow):
            if variant == "nohdr":
                z = jnp.zeros((SUBG, LANES), I32)
                return z + hrow, z
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

            o = op & 127
            emit = open_ & (rem > 0) & active
            is_copy = emit & (from_inp == 0)
            take = jnp.minimum(rem, 128 - o)
            take = jnp.where(is_copy, jnp.minimum(take, dist), take)
            take = jnp.where(emit, take, 0)

            q = jnp.where(is_copy, OUTBASE + op - dist, src)
            qr = q >> 7

            if variant == "noload":
                La, Lb = Ha, Hb
            elif variant == "noscr":
                rows_a, rows_b = [], []
                for r in range(SUBG):
                    c = gi * SUBG + r
                    pr = uni_ref[pl.ds(c * RT + (gi & 3), 2), :]
                    rows_a.append(pr[0:1])
                    rows_b.append(pr[1:2])
                La = jnp.concatenate(rows_a, axis=0)
                Lb = jnp.concatenate(rows_b, axis=0)
            else:
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

            if variant == "noemit":
                value = La
            else:
                spos = q + lane - o
                v_far = gather2(La, Lb, (spos - (qr << 7)) & 255)
                is_copy_b = jnp.broadcast_to(is_copy[:, 0:1], (SUBG, LANES))
                in_tile = is_copy_b & (spos >= OUTBASE + (wrow << 7))
                v_tile = jnp.take_along_axis(tile, spos & 127, axis=1)
                value = jnp.where(in_tile, v_tile, v_far)

            mask = (lane >= o) & (lane < o + take)
            tile = jnp.where(mask, value, tile)
            op = op + take
            rem = rem - take
            src = src + take
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
                wrow = op >> 7
                hrow = ip >> 7
                Ha, Hb = hdr_load(gi, hrow)
                hbase = jnp.maximum(jnp.minimum(hrow, Rc - 2), 0) << 7
                open_ = jnp.ones((SUBG, LANES), jnp.bool_)
                envs.append([Ha, Hb, hbase, wrow, open_])
            sts = list(states)
            for _ in range(K):
                for gi in range(G):
                    sts[gi], open_ = token_step(gi, sts[gi], envs[gi])
                    envs[gi][4] = open_

            out_states = []
            for gi in range(G):
                ip, op, rem, src, from_inp, dist, err, tile = sts[gi]
                wrow = envs[gi][3]
                if variant == "nostore":
                    pass
                elif variant == "storescr":
                    # store to a SEPARATE small ref at a static address:
                    # isolates uni-ref aliasing + dynamic addressing
                    for r in range(SUBG):
                        scr_refs[gi][pl.ds(r, 1), :] = tile[r: r + 1, :]
                elif variant == "storestatic":
                    # store to uni_ref at a STATIC per-chunk row: isolates
                    # the dynamic-address component
                    for r in range(SUBG):
                        c = gi * SUBG + r
                        uni_ref[pl.ds(c * RT + Rc, 1), :] = tile[r: r + 1, :]
                elif variant == "storedyn_scr":
                    # dynamic store into the scr ref (separate buffer,
                    # dynamic address)
                    scr_refs[gi][...] = wrow
                    for r in range(SUBG):
                        row = jnp.clip(scr_refs[gi][r, 0], 0, SUBG - 1)
                        scr_refs[gi][pl.ds(row, 1), :] = tile[r: r + 1, :]
                else:
                    scr_refs[gi][...] = wrow
                    for r in range(SUBG):
                        c = gi * SUBG + r
                        row = Rc + jnp.minimum(scr_refs[gi][r, 0], OUT_ROWSP - 1)
                        uni_ref[pl.ds(c * RT + row, 1), :] = tile[r: r + 1, :]
                crossed_it = (op >> 7) > wrow
                tile = jnp.where(crossed_it, zero, tile)
                out_states.append((ip, op, rem, src, from_inp, dist, err, tile))
            return (steps + 1, tuple(out_states))

        init_states = tuple(
            (vlen_g[gi], zero, zero, zero, zero, zero, err0_g[gi], zero)
            for gi in range(G))
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
    return _decode_kernel


@partial(jax.jit, static_argnames=("variant", "iters"))
def run_variant(comp, comp_lens, variant, iters):
    B, Lc = comp.shape
    Rc = Lc // LANES
    RT = Rc + OUT_ROWSP
    rows = comp.astype(I32).reshape(B * Rc, LANES)
    NG = B // SUB
    uni_rows, meta = pl.pallas_call(
        make_kernel(variant, iters),
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
        interpret=False,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(comp_lens.astype(I32), rows)
    return meta[:, 2]


def main():
    import os
    from aircompressor_tpu.snappy import SnappyCompressor

    TESTDATA = "/root/reference/testdata"
    NB = int(os.environ.get("NB", "64"))
    names = ["urls.10K", "html", "geo.protodata", "kppkn.gtb", "house.jpg",
             "mapreduce-osdi-1.pdf", "large/bible.txt", "large/world192.txt"]
    data = b"".join(open(os.path.join(TESTDATA, n), "rb").read()
                    for n in names if os.path.exists(os.path.join(TESTDATA, n)))
    data = (data * (NB * 65536 // len(data) + 2))
    comp = SnappyCompressor.create()
    blobs = []
    for lo in range(0, len(data), 65536):
        c = data[lo:lo + 65536]
        if len(c) < 65536:
            break
        b = comp.compress(c)
        if len(b) <= 40960:
            blobs.append(b)
        if len(blobs) == NB:
            break
    blobs.sort(key=len)
    cap = 40960 + 1024
    buf = np.zeros((NB, cap), np.uint8)
    lens = np.zeros(NB, np.int32)
    for i, b in enumerate(blobs):
        buf[i, :len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    d, l = jnp.asarray(buf), jnp.asarray(lens)
    print(f"{NB} chunks, device {jax.devices()[0]}", flush=True)

    I1 = int(os.environ.get("I1", "512"))
    I2 = int(os.environ.get("I2", "8192"))
    variants = sys.argv[1:] or ["base", "noload", "noscr", "nohdr",
                                "noemit", "nostore"]
    for v in variants:
        ts = {}
        for it in (I1, I2):
            np.asarray(run_variant(d, l, v, it))  # compile+warm
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                rs = [run_variant(d, l, v, it) for _ in range(3)]
                for r in rs:
                    np.asarray(r)
                best = min(best, (time.perf_counter() - t0) / 3)
            ts[it] = best
        bodies = I2 - I1
        per_body = (ts[I2] - ts[I1]) / bodies
        print(f"{v:8s}: {per_body*1e9:8.1f} ns/body "
              f"({per_body/ (G*K) *1e9:6.2f} ns/group-step) "
              f"[t{I1}={ts[I1]*1e3:.1f}ms t{I2}={ts[I2]*1e3:.1f}ms]",
              flush=True)


if __name__ == "__main__":
    main()
