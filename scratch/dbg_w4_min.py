"""Find a minimal failing input for snappy_w4 on device: one batch of 32
prefix lengths of a known-bad chunk, fixed cap (single compile)."""
import os
import sys

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
d0 = open("/root/reference/testdata/urls.10K", "rb").read()
chunk = d0[6 * 65536:7 * 65536]  # case 14 in dbg (first bad urls chunk)

SUBG, G, K, M = 8, 4, 8, 4
impl, SUB = w4.build_impl(SUBG, G, K, M)
CAP = 41984


def run_sizes(sizes):
    cases = [chunk[:n] for n in sizes]
    blobs = [comp.compress(c) for c in cases]
    buf = np.zeros((SUB, CAP), np.uint8)
    lens = np.zeros(SUB, np.int32)
    for i, b in enumerate(blobs):
        assert len(b) < CAP - 1024
        buf[i, :len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    out, olens, ok, _ = impl(jnp.asarray(buf), jnp.asarray(lens))
    out, olens, ok = np.asarray(out), np.asarray(olens), np.asarray(ok)
    res = []
    for i, c in enumerate(cases):
        good = bool(ok[i]) and out[i, :olens[i]].tobytes() == c
        res.append(good)
    return res


sizes = [2048 * (i + 1) for i in range(32)]
res = run_sizes(sizes)
print([f"{s}:{'ok' if r else 'BAD'}" for s, r in zip(sizes, res)], flush=True)
bad_sizes = [s for s, r in zip(sizes, res) if not r]
if bad_sizes:
    lo = max([s for s in sizes if s < bad_sizes[0]] or [1])
    hi = bad_sizes[0]
    # refine between lo..hi
    sizes2 = sorted(set(lo + (hi - lo) * (i + 1) // 32 for i in range(32)))
    while len(sizes2) < SUB:
        sizes2.append(hi)
    res2 = run_sizes(sizes2)
    print([f"{s}:{'ok' if r else 'BAD'}" for s, r in zip(sizes2, res2)],
          flush=True)
    first_bad = min(s for s, r in zip(sizes2, res2) if not r)
    print("FIRST BAD size:", first_bad, flush=True)
    with open("/tmp/w4_min_case.bin", "wb") as f:
        f.write(chunk[:first_bad])
else:
    print("no failures?!", flush=True)
