"""Time the production snappy_pallas_w.decode vs the fixed-iteration ablation
kernel on the SAME 64-chunk batch, plus the production kernel's reported
step count. Isolates: live-cond cost, wrapper overhead, barrier."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from aircompressor_tpu.snappy import SnappyCompressor
from aircompressor_tpu.ops import snappy_pallas_w as w
import importlib.util

spec = importlib.util.spec_from_file_location(
    "ablate_w4", "/root/repo/scratch/ablate_w4.py")
ab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab)

TESTDATA = "/root/reference/testdata"
names = ["urls.10K", "html", "geo.protodata", "large/bible.txt"]
raws = []
for n in names:
    d = open(os.path.join(TESTDATA, n), "rb").read()
    raws += [d[lo:lo + 65536] for lo in range(0, len(d), 65536)]
raws = [r for r in raws if len(r) == 65536][:64]
comp = SnappyCompressor.create()
blobs = [comp.compress(r) for r in raws]
blobs_sorted = sorted(blobs, key=len)
cap = max(len(b) for b in blobs) + 1024
cap += (-cap) % 1024
buf = np.zeros((64, cap), np.uint8)
lens = np.zeros(64, np.int32)
for i, b in enumerate(blobs_sorted):
    buf[i, :len(b)] = np.frombuffer(b, np.uint8)
    lens[i] = len(b)
d, l = jnp.asarray(buf), jnp.asarray(lens)
total = 64 * 65536


def timeit(fn, reps=3, trials=5):
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(reps)]
        for r in rs:
            np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


# production
out, olens, ok, steps = w.decode(d, l, with_steps=True)
print(f"prod ok={bool(np.asarray(ok).all())} steps={np.asarray(steps)[0]}",
      flush=True)
t = timeit(lambda: w.decode(d, l)[1])
print(f"prod decode():      {t*1e3:7.2f} ms  {total/t/1e9:.3f} GB/s", flush=True)

# production jitted impl directly (skip wrapper slicing)
w._decode_impl(d_pad := jnp.pad(d, ((0, 0), (0, 0))), l, False)
t = timeit(lambda: w._decode_impl(d, l, False)[1])
print(f"prod _decode_impl:  {t*1e3:7.2f} ms  {total/t/1e9:.3f} GB/s", flush=True)

# fixed-iteration kernel at just-past-completion body count
nsteps = int(np.asarray(steps)[0])
for iters in (nsteps, 2048, 4096):
    np.asarray(ab.run_variant(d, l, "base", iters))
    t = timeit(lambda: ab.run_variant(d, l, "base", iters))
    print(f"fixed iters={iters:5d}: {t*1e3:7.2f} ms  {total/t/1e9:.3f} GB/s",
          flush=True)
