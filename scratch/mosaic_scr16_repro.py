"""MINIMAL REPRO (r5, upstream-reportable): Mosaic 16-sublane dynamic-load
corruption under interleaved RMW stores.

A loop body that (1) performs per-row dynamic VMEM row loads for 16
sublane rows, (2) issues >= 7 interleaved dynamic read-modify-write
stores to a SECOND scratch ref, then (3) repeats the SAME loads, observes
the two load sets DISAGREE (~50% of iterations) on TPU v5e:

  ENC_SUB=16                           -> REPRODUCED (selfc ~ N/2)
  ENC_SUB=16 RMW_K=6                   -> clean (<= 6 stores)
  ENC_SUB=16 NO_TABWRITE=1             -> clean (probe loads only)
  ENC_SUB=8  (any store count)         -> clean
  interpret mode (any config)          -> clean
  input memory xor-verified INTACT     -> a load-path bug, not OOB stores

Knobs: NO_WC (drop the candidate-indexed load — NOT required),
FORI (fori instead of while — divergence persists either way),
NO_SCR (direct vector->scalar extracts instead of the scratch roundtrip
— NOT required), RMW_K=<k> (stores from rows 0..k-1 only; boundary at 7),
ONE_RMW / NO_TABWRITE (clean).

This is the root cause behind the SUB=16 encode-kernel corruption that
parked ~7x of encode throughput across rounds 4-5 (DESIGN.md §8.4, §9):
the matcher's candidate loads return garbage, so matches never verify
(the kernels' 4-byte check catches it and emits literals — which is why
hardware output stayed VALID but unmatched/bloated).

Follow-up (second channel, still open): with <= 6-stores-per-ref splits
applied to the full encode kernel, the matcher revives at SUB=16 but
literal CONTENT corrupts deterministically for ALL sublanes (identical
sizes on repeat runs; period-8-duplicated inputs produce identical
per-half sizes yet every chunk still fails oracle decode — so it is not
sublane mirroring). The residual channel is in the drain/emission path
and survives every source-level restructuring (both gather2-style and
take_along_axis drains corrupt). Production kernels stay at 8 sublanes.

Canonical run: ENC_SUB=16 python scratch/mosaic_scr16_repro.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

I32 = jnp.int32
LANES = 128
SUB = int(os.environ.get("ENC_SUB", "16"))
NO_TAB = os.environ.get("NO_TAB") == "1"   # drop the table RMW
NO_WC = os.environ.get("NO_WC") == "1"     # drop the cand_v-indexed load
FORI = os.environ.get("FORI") == "1"       # fori_loop instead of while
NO_TABWRITE = os.environ.get("NO_TABWRITE") == "1"  # probe loads only
ONE_RMW = os.environ.get("ONE_RMW") == "1"  # only r=0 does the RMW
RMW_K = int(os.environ.get("RMW_K", "99"))  # rows 0..K-1 do the write-back
NO_SCR = os.environ.get("NO_SCR") == "1"    # direct vector->scalar extracts
SPLIT6 = os.environ.get("SPLIT6") == "1"    # barrier-load every 6 stores
TAB3 = os.environ.get("TAB3") == "1"        # split stores across 3 refs
PURE_STORE = os.environ.get("PURE_STORE") == "1"  # non-RMW write-back
ROWS = 512  # like IN_ROWS
TAB_ROWS = 128
N_ITERS = 2048


def kernel(in_ref, meta_ref, tab_ref, tab_b, tab_c, scr_ref):
    lane = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    riota = jax.lax.broadcasted_iota(I32, (SUB, 1), 0)
    zero = jnp.zeros((SUB, LANES), I32)

    tab_ref[:, :] = jnp.full((SUB * TAB_ROWS, LANES), -1, I32)
    if TAB3:
        tab_b[:, :] = jnp.full((SUB * TAB_ROWS, LANES), -1, I32)
        tab_c[:, :] = jnp.full((SUB * TAB_ROWS, LANES), -1, I32)

    def tab_of(r):
        if not TAB3:
            return tab_ref
        return tab_ref if r < 6 else (tab_b if r < 12 else tab_c)

    def gather2(a, b, idx):
        m = idx & 127
        return jnp.where(idx < 128,
                         jnp.take_along_axis(a, m, axis=1),
                         jnp.take_along_axis(b, m, axis=1))

    def in_pair(posv):
        scr_ref[...] = jnp.broadcast_to(posv[:, 0:1], (SUB, LANES))
        ra, rb = [], []
        for r in range(SUB):
            h = (posv[r, 0] if NO_SCR else scr_ref[r, 0]) >> 7
            h0 = jnp.clip(h, 0, ROWS - 1)
            h1 = jnp.clip(h + 1, 0, ROWS - 1)
            ra.append(in_ref[pl.ds(r * ROWS + h0, 1), :])
            rb.append(in_ref[pl.ds(r * ROWS + h1, 1), :])
        return jnp.concatenate(ra, axis=0), jnp.concatenate(rb, axis=0)

    def bytes4(posv):
        a, b = in_pair(posv)
        pk = gather2(a, b, (posv & 127) + jnp.minimum(lane, 3))
        return (pk[:, 0:1] | (pk[:, 1:2] << 8) | (pk[:, 2:3] << 16)
                | (pk[:, 3:4] << 24))

    def cond(c):
        i, ip, okc, selfc = c
        return (jnp.max((ip < N_ITERS).astype(I32)[:, 0:1]) > 0) & (i < N_ITERS)

    def body(c):
        i, ip, okc, selfc = c
        pos = (ip * 13 + riota * 7) % (ROWS * LANES - 8)
        w = bytes4(pos)
        # hash-table RMW between the two loads (scal roundtrips inside)
        h = jax.lax.shift_right_logical(
            w * jnp.int32(0x1E35A7BD), 32 - 14) & ((1 << 14) - 1)
        if not NO_TAB:
            scr_ref[...] = jnp.broadcast_to(h[:, 0:1], (SUB, LANES))
            cands = []
            for r in range(SUB):
                tr = tab_of(r)
                trow = jnp.clip(scr_ref[r, 0] >> 7, 0, TAB_ROWS - 1)
                row = tr[pl.ds(r * TAB_ROWS + trow, 1), :]
                cands.append(row)
                if NO_TABWRITE or (ONE_RMW and r > 0) or r >= RMW_K:
                    continue
                hl = scr_ref[r, 0] & 127
                lv = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
                if PURE_STORE:
                    tr[pl.ds(r * TAB_ROWS + trow, 1), :] = jnp.broadcast_to(
                        pos[r, 0], (1, LANES))
                else:
                    tr[pl.ds(r * TAB_ROWS + trow, 1), :] = jnp.where(
                        lv == hl, pos[r, 0], row)
                if SPLIT6 and (r % 6) == 5:
                    rb = tr[pl.ds(r * TAB_ROWS + trow, 1), :]
                    cands[-1] = jnp.where(lv == hl, rb, cands[-1])
            C = jnp.concatenate(cands, axis=0)
            cand_v = jnp.take_along_axis(
                C, jnp.broadcast_to(h & 127, (SUB, LANES)), axis=1)[:, 0:1]
        else:
            cand_v = h[:, 0:1] % (ROWS * LANES - 8)
        wc = None if NO_WC else bytes4(jnp.maximum(cand_v, 0))
        w2 = bytes4(pos)  # second load of the SAME position
        okc = okc + (cand_v >= -1).astype(I32)  # keep cand_v live
        selfc = selfc + jnp.broadcast_to(
            (w2 == w), (SUB, LANES)).astype(I32) * 0 + (
            jnp.broadcast_to((w2 == w), (SUB, LANES)).astype(I32))
        del wc
        return (i + 1, ip + 1, okc, selfc)

    ipos = jnp.broadcast_to(riota * 3, (SUB, LANES)) + zero
    if FORI:
        out = jax.lax.fori_loop(
            0, N_ITERS, lambda _, c: body(c), (jnp.int32(0), ipos, zero, zero))
    else:
        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), ipos, zero, zero))
    _, _, okc, selfc = out
    # post-loop integrity scan of in_ref (detects out-of-bounds stores):
    # xor-reduce all rows belonging to each sublane chunk
    xors = []
    for r in range(SUB):
        acc = jnp.zeros((1, LANES), I32)
        def sb(i, a):
            return a ^ in_ref[pl.ds(r * ROWS + i, 1), :]
        acc = jax.lax.fori_loop(0, ROWS, sb, acc)
        xors.append(acc)
    xorv = jnp.concatenate(xors, axis=0)  # (SUB, LANES)
    meta_ref[:, :] = jnp.where(lane == 0, selfc[:, 0:1],
                               jnp.where(lane == 1, okc[:, 0:1], xorv))


def run(interpret):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (SUB * ROWS, LANES), dtype=np.int32)
    globals()['_DATA'] = data
    meta = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((SUB * ROWS, LANES), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, LANES), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, LANES), I32),
        scratch_shapes=[pltpu.VMEM((SUB * TAB_ROWS, LANES), I32),
                        pltpu.VMEM((SUB * TAB_ROWS, LANES), I32),
                        pltpu.VMEM((SUB * TAB_ROWS, LANES), I32),
                        pltpu.VMEM((SUB, LANES), I32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(jnp.asarray(data))
    m = np.asarray(meta)
    # expected xor of input rows per chunk (lane>=2 slots carry xorv)
    exp = np.bitwise_xor.reduce(
        data.reshape(SUB, ROWS, LANES), axis=1)
    got = m.copy()
    intact = [bool((got[r, 2:] == exp[r, 2:]).all()) for r in range(SUB)]
    return m[:, 0], intact


if __name__ == "__main__":
    on_tpu = jax.default_backend() == "tpu"
    selfc, intact = run(interpret=not on_tpu)
    print(f"SUB={SUB} backend={'device' if on_tpu else 'interpret'}")
    print("self-consistent double-loads:", selfc.tolist(),
          f"(expect all {N_ITERS})")
    print("in_ref intact per chunk:", intact)
    print("REPRODUCED" if (selfc != N_ITERS).any() else "no divergence")
