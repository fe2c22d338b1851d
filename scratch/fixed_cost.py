"""Characterize the per-program fixed cost on the relay: trivial kernels,
varying output sizes, pipelining depth."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def timeit(fn, reps, trials=6):
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(reps)]
        for r in rs:
            np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


x = jnp.zeros((8, 128), I32)
tiny = jax.jit(lambda v: v + 1)
np.asarray(tiny(x))
for reps in (1, 3, 10):
    t = timeit(lambda: tiny(x), reps)
    print(f"tiny jit xla      reps={reps:2d}: {t*1e3:7.2f} ms/call", flush=True)


def pk(in_ref, out_ref):
    out_ref[...] = in_ref[...] + 1


tiny_p = jax.jit(lambda v: pl.pallas_call(
    pk, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(v))
np.asarray(tiny_p(x))
for reps in (1, 3, 10):
    t = timeit(lambda: tiny_p(x), reps)
    print(f"tiny pallas       reps={reps:2d}: {t*1e3:7.2f} ms/call", flush=True)

# big-output pallas: same trivial op, 28MB output (like the uni buffer)
big = jnp.zeros((64 * 848, 128), I32)


def bk(in_ref, out_ref):
    out_ref[...] = in_ref[...] + 1


big_p = jax.jit(lambda v: pl.pallas_call(
    bk, out_shape=jax.ShapeDtypeStruct((64 * 848, 128), I32),
    grid=(8,),
    in_specs=[pl.BlockSpec((64 * 106, 128), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((64 * 106, 128), lambda g: (g, 0),
                           memory_space=pltpu.VMEM))(v))
np.asarray(big_p(big)[0, 0])
for reps in (1, 3):
    t = timeit(lambda: big_p(big)[0, 0], reps)
    print(f"big-out pallas    reps={reps:2d}: {t*1e3:7.2f} ms/call", flush=True)

# chained big pallas: does a dependency chain pipeline on-device?
def chain3(v):
    for _ in range(3):
        v = pl.pallas_call(
            bk, out_shape=jax.ShapeDtypeStruct((64 * 848, 128), I32),
            grid=(8,),
            in_specs=[pl.BlockSpec((64 * 106, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64 * 106, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM))(v)
    return v


chain3_j = jax.jit(chain3)
np.asarray(chain3_j(big)[0, 0])
for reps in (1, 3):
    t = timeit(lambda: chain3_j(big)[0, 0], reps)
    print(f"3-chained-in-jit  reps={reps:2d}: {t*1e3:7.2f} ms/call(3 kernels)",
          flush=True)
