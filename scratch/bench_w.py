"""Amortized throughput: pallas8 vs mt vs w kernels on the real chip.
Times each batch N times per measurement loop, subtracting the tunnel
round-trip by measuring 1x and 3x call counts."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from aircompressor_tpu.snappy import SnappyCompressor

TESTDATA = "/root/reference/testdata"

def _pack(blobs):
    cap = max(len(b) for b in blobs) + 1; cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8); lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, :len(b)] = np.frombuffer(b, np.uint8); lens[i] = len(b)
    return jnp.asarray(buf), jnp.asarray(lens)

names = ["urls.10K", "html", "geo.protodata", "kppkn.gtb",
         "calgary/book1", "calgary/book2", "calgary/news", "calgary/bib",
         "canterbury/alice29.txt", "canterbury/plrabn12.txt",
         "large/bible.txt", "large/world192.txt"]
raws = []
for n in names:
    p = os.path.join(TESTDATA, n)
    if not os.path.exists(p): continue
    d = open(p, "rb").read()
    raws += [d[lo:lo+65536] for lo in range(0, len(d), 65536)]
total = sum(len(r) for r in raws)
comp = SnappyCompressor.create()
blobs = [comp.compress(r) for r in raws]
order = np.argsort([len(b) for b in blobs])
blobs = [blobs[i] for i in order]; raws = [raws[i] for i in order]
buf, lens = _pack(blobs)
print(f"{len(raws)} chunks, {total/1e6:.1f} MB, device: {jax.devices()[0]}")

def timed(fn, reps):
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for o in outs: _ = np.asarray(o)
    return time.perf_counter() - t0

for name, mod in [("pallas8", "snappy_pallas8"), ("mt", "snappy_pallas_mt"),
                  ("w", "snappy_pallas_w")]:
    m = __import__(f"aircompressor_tpu.ops.{mod}", fromlist=[mod])
    out, olens, ok = m.decode(buf, lens)
    okh, outh, olh = np.asarray(ok), np.asarray(out), np.asarray(olens)
    bad = sum(1 for i, w in enumerate(raws)
              if not okh[i] or outh[i, :olh[i]].tobytes() != w)
    t1 = min(timed(lambda: m.decode(buf, lens)[1], 1) for _ in range(3))
    t3 = min(timed(lambda: m.decode(buf, lens)[1], 3) for _ in range(3))
    per = (t3 - t1) / 2
    print(f"{name}: amortized {per*1e3:.1f}ms/batch {total/per/1e9:.3f} GB/s "
          f"(1x call {t1*1e3:.1f}ms) bad={bad}", flush=True)
