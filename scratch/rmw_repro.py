"""Minimal repro hunt for the Mosaic SUB=16/32 VMEM-RMW miscompile that
parks the encode kernels at SUB=8 (ops/snappy_encode_pallas.py:47).

Pattern under test (exactly the encode kernels' hash-table discipline):
per while-loop iteration, for each chunk r: dynamic-row READ of a scratch
table, lane-masked modify, unconditional row WRITE-back; next iteration
reads the same/nearby rows and must observe the write.

Checks, per SUB in {8, 16, 32}: write value i at slot(i); read slot(i-1)
and compare against i-1. err counts > 0 = miscompile.
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
TAB_ROWS = 128
ITERS = 512


def make(SUB, variant):
    def kern(out_ref, tab_ref):
        lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
        sub = jax.lax.broadcasted_iota(I32, (SUB, LANES), 0)
        tab_ref[:, :] = jnp.full((SUB * TAB_ROWS, LANES), -1, I32)

        def slot(i):
            # deterministic pseudo-random (trow, hl) per (iteration, chunk)
            x = (i * jnp.int32(0x9E3779B1 - (1 << 32))) ^ (sub * jnp.int32(0x85EBCA77 - (1 << 32)))
            x = x ^ jax.lax.shift_right_logical(x, 13)
            h = x & jnp.int32((TAB_ROWS * LANES) - 1)
            return h  # (SUB, LANES) replicated per row? no: per-lane varies

        def body(i, errs):
            h = slot(i)          # read column 0 per chunk like the encoder
            hprev = slot(i - 1)
            # --- probe previous write
            got = []
            for r in range(SUB):
                trow = hprev[r, 0] >> 7
                row = tab_ref[pl.ds(r * TAB_ROWS + trow, 1), :]
                got.append(row)
            C = jnp.concatenate(got, axis=0)
            val = jnp.take_along_axis(
                C, jnp.broadcast_to(hprev[:, 0:1] & 127, (SUB, LANES)),
                axis=1)[:, 0:1]
            expect_written = (i > 0) if variant == "rmw" else (
                (i > 0) & (((i - 1) % 3) != 0))
            bad = expect_written & (val != i - 1)
            errs = errs + bad.astype(I32)
            # --- RMW write of value i at slot(i)
            for r in range(SUB):
                trow = h[r, 0] >> 7
                row = tab_ref[pl.ds(r * TAB_ROWS + trow, 1), :]
                hl = h[r, 0] & 127
                lv = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
                if variant == "rmw":
                    tab_ref[pl.ds(r * TAB_ROWS + trow, 1), :] = jnp.where(
                        lv == hl, i, row)
                elif variant == "rmw_cond":
                    # like the encoder: sometimes writes back unchanged
                    upd = (i % 3) != 0
                    tab_ref[pl.ds(r * TAB_ROWS + trow, 1), :] = jnp.where(
                        jnp.logical_and(lv == hl, upd), i, row)
            return errs

        errs = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((SUB, 1), I32))
        out_ref[:, :] = jnp.broadcast_to(errs, (SUB, LANES))
    return kern


@partial(jax.jit, static_argnames=("SUB", "variant"))
def run(SUB, variant):
    return pl.pallas_call(
        make(SUB, variant),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, LANES), I32),
        scratch_shapes=[pltpu.VMEM((SUB * TAB_ROWS, LANES), I32)],
        interpret=False,
    )()


def main():
    for variant in ("rmw", "rmw_cond"):
        for SUB in (8, 16, 32):
            try:
                errs = np.asarray(run(SUB, variant))[:, 0]
                # expected errors for i%3==0 skipped writes in rmw_cond:
                print(f"{variant} SUB={SUB}: errs per chunk = {errs.tolist()[:8]}"
                      f"{' ...' if SUB > 8 else ''}", flush=True)
            except Exception as e:
                print(f"{variant} SUB={SUB}: EXC {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
