"""Interpret-mode debug of snappy_w4 on small inputs."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
import importlib.util

spec = importlib.util.spec_from_file_location(
    "snappy_w4", "/root/repo/scratch/snappy_w4.py")
w4 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(w4)

from aircompressor_tpu.snappy import SnappyCompressor

comp = SnappyCompressor.create()
rng = np.random.default_rng(0)

cases = []
# compressible text-ish
base = (b"the quick brown fox jumps over the lazy dog. " * 400)
cases.append(base[:12000])
cases.append(base[:300])
cases.append(bytes(rng.integers(0, 256, 5000, np.uint8)))  # incompressible
cases.append(b"a" * 9000)  # RLE
cases.append(b"ab" * 4000)
cases.append(base[:65536 - len(base) % 65536 + 60000])
cases.append(b"x")
cases.append(b"hello world")
# full 64KB corpus chunks (the failing regime on device)
for nm in ("large/bible.txt", "urls.10K", "html", "large/world192.txt"):
    p = os.path.join("/root/reference/testdata", nm)
    d0 = open(p, "rb").read()
    for lo in range(0, min(len(d0), 6 * 65536), 65536):
        c = d0[lo:lo + 65536]
        if len(c) == 65536:
            cases.append(c)

SUBG, G, K = 8, 4, 8
impl, SUB = w4.build_impl(SUBG, G, K, M=4)
blobs = [comp.compress(c) for c in cases]
while len(blobs) < SUB:
    blobs.append(blobs[0])
    cases.append(cases[0])
cap = max(len(b) for b in blobs) + 1024
cap += (-cap) % 1024
buf = np.zeros((SUB, cap), np.uint8)
lens = np.zeros(SUB, np.int32)
for i, b in enumerate(blobs):
    buf[i, :len(b)] = np.frombuffer(b, np.uint8)
    lens[i] = len(b)
out, olens, ok, steps = impl(jnp.asarray(buf), jnp.asarray(lens))
out, olens, ok = np.asarray(out), np.asarray(olens), np.asarray(ok)
for i, c in enumerate(cases[:len(cases)]):
    got = out[i, :olens[i]].tobytes()
    good = ok[i] and got == c
    msg = "OK " if good else "BAD"
    print(f"{i}: {msg} ok={bool(ok[i])} olen={olens[i]} want={len(c)}")
    if not good and ok[i]:
        g = np.frombuffer(got, np.uint8)
        w = np.frombuffer(c, np.uint8)
        n = min(len(g), len(w))
        d = np.nonzero(g[:n] != w[:n])[0]
        if len(d):
            p = d[0]
            print(f"   first diff @ {p} (row {p//128}, lane {p%128}); "
                  f"got {g[p:p+8].tolist()} want {w[p:p+8].tolist()}")
            print(f"   diff count {len(d)}, diff rows {sorted(set((d//128).tolist()))[:10]}")
