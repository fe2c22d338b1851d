"""Throughput: snappy_pallas8 (1 token/iter) vs snappy_pallas_mt (window/iter)
on the real chip, on a corpus batch. Timed via device->host readback of the
meta output (observes completion of every grid step)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aircompressor_tpu.snappy import SnappyCompressor

TESTDATA = "/root/reference/testdata"


def _pack(blobs):
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return jnp.asarray(buf), jnp.asarray(lens)


names = ["urls.10K", "html", "geo.protodata", "kppkn.gtb",
         "calgary/book1", "calgary/book2", "calgary/news", "calgary/bib",
         "canterbury/alice29.txt", "canterbury/plrabn12.txt",
         "large/bible.txt", "large/world192.txt"]
raws = []
for n in names:
    p = os.path.join(TESTDATA, n)
    if not os.path.exists(p):
        continue
    d = open(p, "rb").read()
    raws += [d[lo: lo + 65536] for lo in range(0, len(d), 65536)]
total = sum(len(r) for r in raws)
print(f"{len(raws)} chunks, {total/1e6:.1f} MB")

comp = SnappyCompressor.create()
blobs = [comp.compress(r) for r in raws]
# sort by compressed length (as the batch codec does) so lockstep chunks match
order = np.argsort([len(b) for b in blobs])
blobs = [blobs[i] for i in order]
raws = [raws[i] for i in order]
buf, lens = _pack(blobs)
print("packed", buf.shape, "device:", jax.devices()[0])

for name, mod in [("pallas8", "snappy_pallas8"), ("mt", "snappy_pallas_mt")]:
    m = __import__(f"aircompressor_tpu.ops.{mod}", fromlist=[mod])
    # warmup/compile
    t0 = time.perf_counter()
    out, olens, ok = m.decode(buf, lens)
    _ = np.asarray(olens)
    t1 = time.perf_counter()
    # verify
    okh = np.asarray(ok)
    outh = np.asarray(out)
    olh = np.asarray(olens)
    bad = 0
    for i, want in enumerate(raws):
        if not okh[i] or outh[i, : olh[i]].tobytes() != want:
            bad += 1
    # timed runs: readback olens only (same program output)
    ts = []
    for _ in range(3):
        t2 = time.perf_counter()
        out, olens, ok = m.decode(buf, lens)
        _ = np.asarray(olens)
        ts.append(time.perf_counter() - t2)
    t = min(ts)
    print(f"{name}: compile+run {t1-t0:.1f}s, best {t*1e3:.1f}ms, "
          f"{total/t/1e9:.3f} GB/s, bad={bad}")
