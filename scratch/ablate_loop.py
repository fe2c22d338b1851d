"""Measure the while_loop skeleton cost: same carry tuple shape and cond as
the snappy megakernel, trivial body. Also variants adding back one section
at a time (gather2-parse, reduction-cond vs scalar-cond)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 128
SUB = 32
ITERS = 4000


def make_kernel(variant):
    def kernel(lens_ref, in_ref, meta_ref):
        lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
        zero = jnp.zeros((SUB, LANES), I32)

        def gather2(row_a, row_b, idx):
            m = idx & 127
            return jnp.where(
                idx < 128,
                jnp.take_along_axis(row_a, m, axis=1),
                jnp.take_along_axis(row_b, m, axis=1),
            )

        def cond(c):
            ip, op, rem, err, steps = c[0], c[1], c[2], c[6], c[7]
            if variant == "scalarcond":
                return steps < ITERS
            more = (rem[:, 0:1] > 0) | (ip[:, 0:1] < ITERS)
            live = (err[:, 0:1] == 0) & more
            return (jnp.max(live.astype(I32)) > 0) & (steps < ITERS)

        def body(c):
            ip, op, rem, src, from_inp, dist, err, steps, tile, prev = c
            if variant in ("gather", "rep5"):
                Ha = in_ref[0:SUB, :]
                Hb = in_ref[SUB : 2 * SUB, :]
                pk = gather2(Ha, Hb, (ip & 127)[:, 0:1] + jnp.minimum(lane, 5))
                if variant == "rep5":
                    tag = jnp.broadcast_to(pk[:, 0:1], (SUB, LANES))
                    b1 = jnp.broadcast_to(pk[:, 1:2], (SUB, LANES))
                    b2 = jnp.broadcast_to(pk[:, 2:3], (SUB, LANES))
                    b3 = jnp.broadcast_to(pk[:, 3:4], (SUB, LANES))
                    b4 = jnp.broadcast_to(pk[:, 4:5], (SUB, LANES))
                    extra = tag + b1 + b2 + b3 + b4
                else:
                    extra = pk
            else:
                extra = tile
            n_ip = ip + 1
            n_tile = tile ^ extra
            return (n_ip, op + 1, (rem + extra) & 7, src ^ n_ip,
                    from_inp + (extra & 1), dist ^ op, err & (extra - extra),
                    steps + 1, n_tile, prev ^ n_tile)

        init = (zero, zero, zero, zero, zero, zero, zero,
                jnp.int32(0), zero, zero)
        out = jax.lax.while_loop(cond, body, init)
        meta_ref[:, :] = out[8] + out[0]

    return kernel


def run(variant):
    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.integers(0, 256, (SUB * 4, LANES), dtype=np.int32))

    @jax.jit
    def go(inp):
        meta = pl.pallas_call(
            make_kernel(variant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((SUB * 4, LANES), lambda g, *_: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((SUB, LANES), lambda g, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((SUB, LANES), I32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(jnp.zeros((SUB,), I32), inp)
        return jnp.sum(meta)

    float(go(inp))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        float(go(inp))
    dt = (time.perf_counter() - t0) / reps
    print(f"{variant:12s} {dt*1e3:8.2f} ms  {dt/ITERS*1e9:7.1f} ns/iter")


for v in ("empty", "scalarcond", "gather", "rep5"):
    run(v)
