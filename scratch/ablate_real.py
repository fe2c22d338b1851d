"""Marginal-cost ablation of the REAL snappy megakernel: make variants of
ops/snappy_pallas8.py with sections DOUBLED (control flow unchanged), time
decode end-to-end on real corpus chunks, divide by the step count the kernel
itself reports. cost(section) ~ t(doubled) - t(base)."""
import importlib.util
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
SRC = open("/root/repo/aircompressor_tpu/ops/snappy_pallas8.py").read()

HDR_ORIG = """            h = hwant[r, 0]
            h0 = jnp.clip(h, 0, Rc - 1)
            h1 = jnp.clip(h + 1, 0, Rc - 1)
            ra.append(in_ref[pl.ds(r * Rc + h0, 1), :])
            rb.append(in_ref[pl.ds(r * Rc + h1, 1), :])"""
HDR_DOUBLE = """            h = hwant[r, 0]
            h0 = jnp.clip(h, 0, Rc - 1)
            h1 = jnp.clip(h + 1, 0, Rc - 1)
            h2 = jnp.clip(h + 2, 0, Rc - 1)
            h3 = jnp.clip(h + 3, 0, Rc - 1)
            xa = in_ref[pl.ds(r * Rc + h2, 1), :]
            xb = in_ref[pl.ds(r * Rc + h3, 1), :]
            live = hwant[r, 0] < -1
            ra.append(jnp.where(live, xa, in_ref[pl.ds(r * Rc + h0, 1), :]))
            rb.append(jnp.where(live, xb, in_ref[pl.ds(r * Rc + h1, 1), :]))"""

FAR_ORIG = """            ia = in_ref[pl.ds(r * Rc + qi0, 1), :]
            ib = in_ref[pl.ds(r * Rc + qi1, 1), :]
            oa = out_ref[pl.ds(r * OUT_ROWSP + qo0, 1), :]
            ob = out_ref[pl.ds(r * OUT_ROWSP + qo1, 1), :]
            rows_a.append(jnp.where(use_in > 0, ia, oa))
            rows_b.append(jnp.where(use_in > 0, ib, ob))"""
FAR_DOUBLE = """            ia = in_ref[pl.ds(r * Rc + qi0, 1), :]
            ib = in_ref[pl.ds(r * Rc + qi1, 1), :]
            oa = out_ref[pl.ds(r * OUT_ROWSP + qo0, 1), :]
            ob = out_ref[pl.ds(r * OUT_ROWSP + qo1, 1), :]
            qi2 = jnp.clip(q + 2, 0, Rc - 1)
            qi3 = jnp.clip(q + 3, 0, Rc - 1)
            qo2 = jnp.clip(q + 2, 0, OUT_ROWS - 1)
            qo3 = jnp.clip(q + 3, 0, OUT_ROWS - 1)
            xa = jnp.where(use_in > 1, in_ref[pl.ds(r * Rc + qi2, 1), :],
                           out_ref[pl.ds(r * OUT_ROWSP + qo2, 1), :])
            xb = jnp.where(use_in > 1, in_ref[pl.ds(r * Rc + qi3, 1), :],
                           out_ref[pl.ds(r * OUT_ROWSP + qo3, 1), :])
            rows_a.append(jnp.where(use_in > 2, xa, jnp.where(use_in > 0, ia, oa)))
            rows_b.append(jnp.where(use_in > 2, xb, jnp.where(use_in > 0, ib, ob)))"""

ST_ORIG = """        for r in range(SUB):
            out_ref[pl.ds(r * OUT_ROWSP + (op[r, 0] >> 7), 1), :] = (
                n_tile[r : r + 1, :])"""
ST_DOUBLE = """        for r in range(SUB):
            out_ref[pl.ds(r * OUT_ROWSP + (op[r, 0] >> 7), 1), :] = (
                n_tile[r : r + 1, :])
        for r in range(SUB):
            out_ref[pl.ds(r * OUT_ROWSP + jnp.maximum(op[r, 0] >> 7, OUT_ROWS), 1), :] = (
                n_tile[r : r + 1, :])"""

GA_ORIG = """        near_b = jnp.broadcast_to(near[:, 0:1], (SUB, LANES))
        src_a = jnp.where(near_b, prev, La)
        src_b = jnp.where(near_b, tile, Lb)
        idx = jnp.where(near_b, idx_near, idx_far)
        placed = gather2(src_a, src_b, idx & 255)"""
GA_DOUBLE = """        near_b = jnp.broadcast_to(near[:, 0:1], (SUB, LANES))
        src_a = jnp.where(near_b, prev, La)
        src_b = jnp.where(near_b, tile, Lb)
        idx = jnp.where(near_b, idx_near, idx_far)
        placed = gather2(src_a, src_b, idx & 255)
        placed2 = gather2(src_b, src_a, (idx + 1) & 255)
        placed = jnp.where(near_b & (idx < -999), placed2, placed)"""

VARIANTS = {
    "base": [],
    "hdr2x": [(HDR_ORIG, HDR_DOUBLE)],
    "far2x": [(FAR_ORIG, FAR_DOUBLE)],
    "store2x": [(ST_ORIG, ST_DOUBLE)],
    "gather2x": [(GA_ORIG, GA_DOUBLE)],
}


def load_variant(name):
    src = SRC
    for a, b in VARIANTS[name]:
        assert a in src, f"pattern missing for {name}"
        src = src.replace(a, b)
    path = f"/tmp/snappy_ab_{name}.py"
    open(path, "w").write(src)
    spec = importlib.util.spec_from_file_location(f"snappy_ab_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def corpus_chunks():
    from aircompressor_tpu.snappy import SnappyCompressor

    comp = SnappyCompressor.create()
    blobs, total = [], 0
    for n in ("urls.10K", "html", "geo.protodata", "kppkn.gtb"):
        d = open(f"/root/reference/testdata/{n}", "rb").read()
        for lo in range(0, len(d), 65536):
            ch = d[lo : lo + 65536]
            blobs.append(comp.compress(ch))
            total += len(ch)
    return blobs, total


def pack(blobs):
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return jnp.asarray(buf), jnp.asarray(lens)


blobs, total = corpus_chunks()
buf, lens = pack(blobs)
print(f"corpus: {len(blobs)} chunks, {total/1e6:.1f} MB decompressed")

base_per = None
for name in VARIANTS:
    mod = load_variant(name)
    out, olens, ok, steps = mod.decode(buf, lens, with_steps=True)
    ok_n = np.asarray(ok)
    st = np.asarray(steps)
    # grid steps are sequential; total iterations = sum over grid groups of
    # that group's step count (steps is per-chunk, same within a group)
    G = (len(blobs) + mod.SUB - 1) // mod.SUB
    iters = sum(int(st[g * mod.SUB]) for g in range(G))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out, olens, ok, steps = mod.decode(buf, lens, with_steps=True)
        np.asarray(olens)  # force completion via readback
    dt = (time.perf_counter() - t0) / reps
    per = dt / iters
    delta = "" if base_per is None else f"  delta {1e9*(per-base_per):+7.1f} ns/iter"
    if base_per is None:
        base_per = per
    print(f"{name:10s} ok={ok_n.all()} {dt*1e3:8.2f} ms  {iters} iters  "
          f"{per*1e9:7.1f} ns/iter{delta}  {total/dt/1e9:.3f} GB/s")
