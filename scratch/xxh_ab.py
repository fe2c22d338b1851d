"""xxh64 stripe-kernel ablation: find the 5.4us/iteration pathology.

Variants (all fixed-iteration, timed by slope between two loop bounds):
  cur     exact production body ((4,128) state, reshape/strided-slice feed)
  flat    layout change: lo words rows 0-3, hi words rows 4-7 (no strided
          slice / reshape per iteration)
  unroll  flat + U=8 stripes per iteration, data products bulk-computed
  pack4   flat + 4 stream groups per grid step ((16,128) state tiles)
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

from aircompressor_tpu.ops import u64
from aircompressor_tpu.ops.xxhash_jax import P64_1, P64_2

LANES = 128
U32 = jnp.uint32
L = 65536
NSTRIPES = L // 32  # 2048


def make(variant, iters):
    def kern(words_ref, state_ref):
        ones = jnp.ones((LANES,), U32)
        inits = [
            u64.add(u64.const(0), u64.const((P64_1 + P64_2) & 0xFFFFFFFFFFFFFFFF)),
            u64.add(u64.const(0), u64.const(P64_2)),
            u64.const(0),
            u64.sub(u64.const(0), u64.const(P64_1)),
        ]
        if variant == "pack4":
            his = jnp.concatenate(
                [jnp.stack([v[0] * ones for v in inits]) for _ in range(4)])
            los = jnp.concatenate(
                [jnp.stack([v[1] * ones for v in inits]) for _ in range(4)])
        else:
            his = jnp.stack([v[0] * ones for v in inits])
            los = jnp.stack([v[1] * ones for v in inits])

        if variant == "cur":
            def body(s, carry):
                his, los = carry
                lanes = words_ref[pl.ds(8 * s, 8), :]
                pairs = lanes.reshape(4, 2, LANES)
                l_lo = pairs[:, 0, :]
                l_hi = pairs[:, 1, :]
                nhi, nlo = u64.mul(
                    u64.rotl(u64.add((his, los),
                                     u64.mul((l_hi, l_lo), u64.const(P64_2))), 31),
                    u64.const(P64_1))
                return nhi, nlo
            his, los = jax.lax.fori_loop(0, iters, body, (his, los))
        elif variant == "flat":
            def body(s, carry):
                his, los = carry
                lanes = words_ref[pl.ds(8 * s, 8), :]
                l_lo = lanes[0:4]
                l_hi = lanes[4:8]
                nhi, nlo = u64.mul(
                    u64.rotl(u64.add((his, los),
                                     u64.mul((l_hi, l_lo), u64.const(P64_2))), 31),
                    u64.const(P64_1))
                return nhi, nlo
            his, los = jax.lax.fori_loop(0, iters, body, (his, los))
        elif variant == "unroll":
            U = 8
            def body(s, carry):
                his, los = carry
                lanes = words_ref[pl.ds(8 * U * s, 8 * U), :]  # (64, 128)
                # bulk product: all U stripes' w*P2 at once
                l_lo = lanes.reshape(U * 8, LANES)[0: 4 * U]
                l_hi = lanes.reshape(U * 8, LANES)[4 * U: 8 * U]
                phi, plo = u64.mul((l_hi, l_lo), u64.const(P64_2))
                for k in range(U):
                    his, los = u64.mul(
                        u64.rotl(u64.add((his, los),
                                         (phi[4 * k: 4 * k + 4],
                                          plo[4 * k: 4 * k + 4])), 31),
                        u64.const(P64_1))
                return his, los
            his, los = jax.lax.fori_loop(0, iters // U, body, (his, los))
        elif variant == "pack4":
            def body(s, carry):
                his, los = carry
                lanes = words_ref[pl.ds(8 * s, 8), :]
                l_lo = jnp.concatenate([lanes[0:4]] * 4)
                l_hi = jnp.concatenate([lanes[4:8]] * 4)
                nhi, nlo = u64.mul(
                    u64.rotl(u64.add((his, los),
                                     u64.mul((l_hi, l_lo), u64.const(P64_2))), 31),
                    u64.const(P64_1))
                return nhi, nlo
            his, los = jax.lax.fori_loop(0, iters, body, (his, los))
        state_ref[0: his.shape[0]] = his
        state_ref[his.shape[0]:] = los
    return kern


@partial(jax.jit, static_argnames=("variant", "iters"))
def run(words, variant, iters):
    rows = 32 if variant == "pack4" else 8
    return pl.pallas_call(
        make(variant, iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), U32),
        interpret=False,
    )(words)


def main():
    rng = np.random.default_rng(0)
    # flat layout: per stripe s, rows 8s..8s+3 = lo words, 8s+4.. = hi
    words = jnp.asarray(rng.integers(0, 2**32, (NSTRIPES * 8, LANES), np.uint64).astype(np.uint32))
    I1, I2 = 256, 2048
    for v in (sys.argv[1:] or ["cur", "flat", "unroll", "pack4"]):
        ts = {}
        for it in (I1, I2):
            np.asarray(run(words, v, it))
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                rs = [run(words, v, it) for _ in range(20)]
                for r in rs:
                    np.asarray(r)
                best = min(best, (time.perf_counter() - t0) / 20)
            ts[it] = best
        per = (ts[I2] - ts[I1]) / (I2 - I1)
        streams = 512 if v == "pack4" else 128
        gbps = streams * 32 / per / 1e9 if per > 0 else float("nan")
        print(f"{v:7s}: {per*1e9:8.1f} ns/stripe-iter -> {gbps:6.2f} GB/s "
              f"[t{I1}={ts[I1]*1e3:.2f}ms t{I2}={ts[I2]*1e3:.2f}ms]", flush=True)


if __name__ == "__main__":
    main()
