"""Reproduce the failing group-mix in interpret (CPU) vs device."""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
import importlib.util

spec = importlib.util.spec_from_file_location(
    "snappy_w4", "/root/repo/scratch/" + __import__("os").environ.get("W4MOD", "snappy_w4") + ".py")
w4 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(w4)
from aircompressor_tpu.snappy import SnappyCompressor

comp = SnappyCompressor.create()
d0 = open("/root/reference/testdata/urls.10K", "rb").read()
chunk = d0[6 * 65536:7 * 65536]

SUBG, G, K, M = 8, 4, 8, 4
impl, SUB = w4.build_impl(SUBG, G, K, M)
CAP = 41984

# group 0 = the failing mix; groups 1-3 = tiny fillers
sizes = [2048 * (i + 1) for i in range(8)] + [64] * 24
cases = [chunk[:n] for n in sizes]
blobs = [comp.compress(c) for c in cases]
buf = np.zeros((SUB, CAP), np.uint8)
lens = np.zeros(SUB, np.int32)
for i, b in enumerate(blobs):
    buf[i, :len(b)] = np.frombuffer(b, np.uint8)
    lens[i] = len(b)
out, olens, ok, _ = impl(jnp.asarray(buf), jnp.asarray(lens))
out, olens, ok = np.asarray(out), np.asarray(olens), np.asarray(ok)
for i in range(8):
    c = cases[i]
    got = out[i, :olens[i]].tobytes()
    good = bool(ok[i]) and got == c
    print(f"{i} n={sizes[i]}: {'OK' if good else 'BAD'} ok={bool(ok[i])}")
    if not good and ok[i]:
        g = np.frombuffer(got, np.uint8)
        w = np.frombuffer(c, np.uint8)
        n = min(len(g), len(w))
        d = np.nonzero(g[:n] != w[:n])[0]
        if len(d):
            p = d[0]
            print(f"   first diff @ {p} (row {p//128}, lane {p%128}); "
                  f"got {g[p:p+8].tolist()} want {w[p:p+8].tolist()} "
                  f"ndiff={len(d)}")
print("backend:", jnp.zeros(1).devices())
