"""Ablate the snappy megakernel iteration cost on the real chip.

Builds variants of a representative iteration body (same shapes/ops as
ops/snappy_pallas8.py) with pieces removed, runs each for a FIXED number of
iterations, times via scalar readback (axon block_until_ready observes
enqueue only). Correctness is irrelevant here - only instruction mix.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 128
SUB = 32
OUT_ROWS = 512
OUT_ROWSP = 520
ITERS = 2000
Rc = 640  # input rows per chunk


def make_kernel(variant):
    def kernel(in_ref, out_ref, meta_ref):
        lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
        zero = jnp.zeros((SUB, LANES), I32)

        def gather2(row_a, row_b, idx):
            m = idx & 127
            return jnp.where(
                idx < 128,
                jnp.take_along_axis(row_a, m, axis=1),
                jnp.take_along_axis(row_b, m, axis=1),
            )

        def body(k, c):
            ip, op, acc, tile, prev = c

            # ---- header loads (2 rows x SUB chunks)
            if variant in ("full", "nofar", "nostore", "nofar_nostore"):
                ra, rb = [], []
                for r in range(SUB):
                    h = ip[r, 0] >> 7
                    h0 = jnp.clip(h, 0, Rc - 1)
                    h1 = jnp.clip(h + 1, 0, Rc - 1)
                    ra.append(in_ref[pl.ds(r * Rc + h0, 1), :])
                    rb.append(in_ref[pl.ds(r * Rc + h1, 1), :])
                Ha = jnp.concatenate(ra, axis=0)
                Hb = jnp.concatenate(rb, axis=0)
            else:
                Ha = acc
                Hb = acc + 1

            hs = ip & 127
            pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 5))
            tag = jnp.broadcast_to(pk[:, 0:1], (SUB, LANES))
            b1 = jnp.broadcast_to(pk[:, 1:2], (SUB, LANES))

            # ---- ~30 representative vector ops (parse math)
            ttype = tag & 3
            n = tag >> 2
            lit_extra = jnp.clip(n - 59, 0, 4)
            ext = jnp.where(lit_extra == 0, n + 1, b1 + 1)
            is_lit = ttype == 0
            cp_len = jnp.where(ttype == 1, 4 + ((tag >> 2) & 7), n + 1)
            cp_dist = ((tag >> 5) << 8) | b1
            take0 = jnp.where(is_lit, ext, cp_len)
            m_dist = jnp.where(is_lit, jnp.int32(65536), cp_dist)
            m_src = ip + 1 + take0

            # ---- far loads (4 rows x SUB)
            if variant in ("full", "nostore"):
                q_all = jnp.where(is_lit, m_src, op - m_dist) & 0x7FFF
                rows_a, rows_b = [], []
                for r in range(SUB):
                    q = q_all[r, 0] >> 7
                    qi0 = jnp.clip(q, 0, Rc - 1)
                    qi1 = jnp.clip(q + 1, 0, Rc - 1)
                    qo0 = jnp.clip(q, 0, OUT_ROWS - 1)
                    qo1 = jnp.clip(q + 1, 0, OUT_ROWS - 1)
                    ia = in_ref[pl.ds(r * Rc + qi0, 1), :]
                    ib = in_ref[pl.ds(r * Rc + qi1, 1), :]
                    oa = out_ref[pl.ds(r * OUT_ROWSP + qo0, 1), :]
                    ob = out_ref[pl.ds(r * OUT_ROWSP + qo1, 1), :]
                    use_in = is_lit.astype(I32)[r, 0]
                    rows_a.append(jnp.where(use_in > 0, ia, oa))
                    rows_b.append(jnp.where(use_in > 0, ib, ob))
                La = jnp.concatenate(rows_a, axis=0)
                Lb = jnp.concatenate(rows_b, axis=0)
            else:
                La, Lb = Ha, Hb

            o = op & 127
            idx = (m_src & 127) + lane - o
            placed = gather2(La, Lb, idx & 255)
            take = jnp.minimum(take0, 128 - o)
            mask = (lane >= o) & (lane < o + take)
            n_tile = jnp.where(mask, placed, tile)
            n_op = op + take

            # ---- store (1 row x SUB)
            if variant in ("full", "nofar"):
                for r in range(SUB):
                    row = jnp.minimum(op[r, 0] >> 7, OUT_ROWSP - 1)
                    out_ref[pl.ds(r * OUT_ROWSP + row, 1), :] = (
                        n_tile[r : r + 1, :])

            crossed = ((n_op & 127) == 0) & (take > 0)
            n_prev = jnp.where(crossed, n_tile, prev)
            n_tile2 = jnp.where(crossed, zero, n_tile)
            n_ip = (ip + 3) & 0xFFFF
            return (n_ip, n_op & 0xFFFF, acc + tag, n_tile2, n_prev)

        def body2(c):
            steps = c[0]
            rest = body(steps, c[1:])
            return (steps + 1,) + rest

        def cond(c):
            return c[0] < ITERS

        init = (jnp.int32(0), zero, zero, zero, zero, zero)
        out = jax.lax.while_loop(cond, body2, init)
        meta_ref[:, :] = out[3]

    return kernel


def run(variant):
    rng = np.random.default_rng(0)
    inp = jnp.asarray(
        rng.integers(0, 256, (SUB * Rc, LANES), dtype=np.int32))

    @jax.jit
    def go(inp):
        out_rows, meta = pl.pallas_call(
            make_kernel(variant),
            grid=(1,),
            in_specs=[pl.BlockSpec((SUB * Rc, LANES), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((SUB * OUT_ROWSP, LANES), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((SUB * OUT_ROWSP, LANES), I32),
                jax.ShapeDtypeStruct((SUB, LANES), I32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(inp)
        return jnp.sum(meta)

    float(go(inp))  # warm/compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = float(go(inp))
    dt = (time.perf_counter() - t0) / reps
    per_iter = dt / ITERS
    print(f"{variant:16s} {dt*1e3:8.2f} ms total  {per_iter*1e9:8.1f} ns/iter")


for v in ("full", "nofar", "nostore", "nofar_nostore", "noloads"):
    run(v)
