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

PARSE_ORIG = '        ttype = tag & 3\n        n = tag >> 2'
PARSE_DOUBLE = '        ttype = tag & 3\n        _tt2 = (tag + prev) & 3\n        _n2 = (tag + prev) >> 2\n        _le2 = jnp.clip(_n2 - 59, 0, 4)\n        _ext2 = jnp.where(\n            _le2 == 0, _n2 + 1,\n            jnp.where(\n                _le2 == 1, b1 + 1,\n                jnp.where(\n                    _le2 == 2, (b1 | (b2 << 8)) + 1,\n                    jnp.where(\n                        _le2 == 3, (b1 | (b2 << 8) | (b3 << 16)) + 1,\n                        (b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)) + 1,\n                    ),\n                ),\n            ),\n        )\n        _il2 = _tt2 == 0\n        _c1l = 4 + ((tag >> 2) & 7)\n        _c1d = ((tag >> 5) << 8) | b1\n        _c2l = _n2 + 1\n        _c2d = b1 | (b2 << 8)\n        _c4d = b1 | (b2 << 8) | (b3 << 16)\n        _cpl = jnp.where(_tt2 == 1, _c1l, _c2l)\n        _cpd = jnp.where(\n            _tt2 == 1, _c1d, jnp.where(_tt2 == 2, _c2d, _c4d))\n        _tsz = jnp.where(\n            _il2,\n            1 + _le2,\n            jnp.where(_tt2 == 1, 2, jnp.where(_tt2 == 2, 3, 5)),\n        )\n        _prm = jnp.where(_il2, _ext2, _cpl)\n        _per = (\n            (_prm < 0)\n            | (_prm > MAX_OUT)\n            | (ip + _tsz > clen)\n            | (_il2 & (ip + _tsz + jnp.clip(_ext2, 0, MAX_OUT) > clen))\n            | (op + jnp.clip(_prm, 0, MAX_OUT) > declared)\n            | (~_il2) & ((_cpd <= 0) | (_cpd > op))\n            | ((_tt2 == 3) & (b4 != 0))\n        )\n        tag = jnp.where(_per & (prev < -99), _prm, tag)\n        n = tag >> 2'
HX_ORIG = '        hwant = ip >> 7\n        ra, rb = [], []'
HX_DOUBLE = '        hwant = ip >> 7\n        _xs = [hwant[r, 0] + hwant[r, 1] for r in range(SUB)]\n        _xv = jnp.stack(_xs).reshape(SUB, 1)\n        hwant = jnp.where(_xv < -99, hwant + 1, hwant)\n        ra, rb = [], []'
EMIT_ORIG = '        mask = (lane >= o) & (lane < o + take)\n        n_tile = jnp.where(mask, placed, tile)'
EMIT_DOUBLE = '        mask = (lane >= o) & (lane < o + take)\n        _m2 = (lane >= o + 1) & (lane < o + take + 1)\n        _nt2 = jnp.where(_m2, placed, tile)\n        _no2 = op + take + 1\n        _cr2 = ((_no2 & 127) == 0) & (take > 0)\n        _np2 = jnp.where(_cr2, _nt2, prev)\n        _nd2 = jnp.where(\n            is_copy & (take == m_dist + 1), jnp.minimum(m_dist * 2, MAX_OUT), m_dist)\n        tile = jnp.where(_m2 & (_nd2 < -99) & (_np2 < -98), _nt2, tile)\n        n_tile = jnp.where(mask, placed, tile)'
VARIANTS = {
    "base": [],
    "parse2x": [(PARSE_ORIG, PARSE_DOUBLE)],
    "extract2x": [(HX_ORIG, HX_DOUBLE)],
    "emit2x": [(EMIT_ORIG, EMIT_DOUBLE)],
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
