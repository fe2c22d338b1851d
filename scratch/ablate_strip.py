"""Strip-down ablation: start from the REAL snappy_pallas8.py (compiles fine)
and replace the loop body with progressively smaller versions, keeping the
carry signature. Iteration count pinned by a steps-based cond so variants are
comparable. Times via readback."""
import importlib.util
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

SRC = open("/root/repo/aircompressor_tpu/ops/snappy_pallas8.py").read()

ITERS = 4000

# pin the loop: ignore real termination, run ITERS iterations
COND_ORIG = """    def cond(c):
        ip, op, rem, err, steps = c[0], c[1], c[2], c[6], c[7]
        more = (rem[:, 0:1] > 0) | (ip[:, 0:1] < clen[:, 0:1])
        live = (err[:, 0:1] == 0) & more
        return (jnp.max(live.astype(I32)) > 0) & (steps < 2 * MAX_OUT)"""
COND_PIN = f"""    def cond(c):
        ip, op, rem, err, steps = c[0], c[1], c[2], c[6], c[7]
        more = (rem[:, 0:1] > 0) | (ip[:, 0:1] < clen[:, 0:1])
        live = (err[:, 0:1] == 0) & more
        keep = (jnp.max(live.astype(I32)) > 0) & (steps < 2 * MAX_OUT)
        return keep | (steps < {ITERS})"""
COND_SCALAR = f"""    def cond(c):
        return c[7] < {ITERS}"""

# body sections, in source order, for surgical removal
HDR_SEC = """        Ha, Hb, hrow = hdr_tile(ip)
        hs = ip & 127
        pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 5))"""
HDR_STUB = """        Ha, Hb = prev, tile
        hrow = ip >> 7
        hs = ip & 127
        pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 5))"""

FAR_SEC = """        rows_a, rows_b = [], []
        for r in range(SUB):
            q = q_all[r, 0] >> 7
            use_in = from_in[r, 0]
            qi0 = jnp.clip(q, 0, Rc - 1)
            qi1 = jnp.clip(q + 1, 0, Rc - 1)
            qo0 = jnp.clip(q, 0, OUT_ROWS - 1)
            qo1 = jnp.clip(q + 1, 0, OUT_ROWS - 1)
            ia = in_ref[pl.ds(r * Rc + qi0, 1), :]
            ib = in_ref[pl.ds(r * Rc + qi1, 1), :]
            oa = out_ref[pl.ds(r * OUT_ROWSP + qo0, 1), :]
            ob = out_ref[pl.ds(r * OUT_ROWSP + qo1, 1), :]
            rows_a.append(jnp.where(use_in > 0, ia, oa))
            rows_b.append(jnp.where(use_in > 0, ib, ob))
        La = jnp.concatenate(rows_a, axis=0)
        Lb = jnp.concatenate(rows_b, axis=0)"""
FAR_STUB = """        La, Lb = prev, tile"""

ST_SEC = """        for r in range(SUB):
            out_ref[pl.ds(r * OUT_ROWSP + (op[r, 0] >> 7), 1), :] = (
                n_tile[r : r + 1, :])"""
ST_STUB = """        out_ref[0:SUB, :] = n_tile"""

VARIANTS = {
    "pin": [(COND_ORIG, COND_PIN)],
    "nohdr": [(COND_ORIG, COND_PIN), (HDR_SEC, HDR_STUB)],
    "nofar": [(COND_ORIG, COND_PIN), (FAR_SEC, FAR_STUB)],
    "nostore": [(COND_ORIG, COND_PIN), (ST_SEC, ST_STUB)],
    "noldst": [(COND_ORIG, COND_PIN), (HDR_SEC, HDR_STUB),
               (FAR_SEC, FAR_STUB), (ST_SEC, ST_STUB)],
    "noldst_sc": [(COND_ORIG, COND_SCALAR), (HDR_SEC, HDR_STUB),
                  (FAR_SEC, FAR_STUB), (ST_SEC, ST_STUB)],
}


def load_variant(name):
    src = SRC
    for a, b in VARIANTS[name]:
        assert a in src, f"pattern missing in {name}"
        src = src.replace(a, b)
    path = f"/tmp/snappy_strip_{name}.py"
    open(path, "w").write(src)
    spec = importlib.util.spec_from_file_location(f"snappy_strip_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    from aircompressor_tpu.snappy import SnappyCompressor

    comp = SnappyCompressor.create()
    d = open("/root/reference/testdata/urls.10K", "rb").read()
    blobs = [comp.compress(d[lo : lo + 65536]) for lo in range(0, 65536 * 8, 65536)]
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    buf, lens = jnp.asarray(buf), jnp.asarray(lens)

    for name in VARIANTS:
        try:
            mod = load_variant(name)
            out, olens, ok, steps = mod.decode(buf, lens, with_steps=True)
            np.asarray(olens)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                _, olens, _, _ = mod.decode(buf, lens, with_steps=True)
                np.asarray(olens)
            dt = (time.perf_counter() - t0) / reps
            it = max(int(np.asarray(steps)[0]), ITERS)
            print(f"{name:10s} {dt*1e3:8.2f} ms  {it} iters  {dt/it*1e9:7.1f} ns/iter")
        except Exception as e:
            print(f"{name:10s} FAILED: {str(e)[:120]}")


main()
