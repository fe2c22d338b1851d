"""lzo_pallas vs lzo_pallas_w on the real chip, amortized."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from aircompressor_tpu.lzo import LzoCompressor

def _pack(blobs):
    cap = max(len(b) for b in blobs) + 1; cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8); lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, :len(b)] = np.frombuffer(b, np.uint8); lens[i] = len(b)
    return jnp.asarray(buf), jnp.asarray(lens)

TESTDATA = "/root/reference/testdata"
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
comp = LzoCompressor.create()
blobs = [comp.compress(r) for r in raws]
order = np.argsort([len(b) for b in blobs])
blobs = [blobs[i] for i in order]; raws = [raws[i] for i in order]
buf, lens = _pack(blobs)
print(f"{len(raws)} chunks, {total/1e6:.1f} MB, device: {jax.devices()[0]}")

for name, mod in [("lzo_pallas", "lzo_pallas"), ("lzo_w", "lzo_pallas_w")]:
    m = __import__(f"aircompressor_tpu.ops.{mod}", fromlist=[mod])
    out, olens, ok = m.decode(buf, lens)
    okh, outh, olh = np.asarray(ok), np.asarray(out), np.asarray(olens)
    bad = sum(1 for i, r in enumerate(raws)
              if not okh[i] or outh[i, :olh[i]].tobytes() != r)
    def t(reps):
        t0 = time.perf_counter()
        outs = [m.decode(buf, lens)[1] for _ in range(reps)]
        for o in outs: _ = np.asarray(o)
        return time.perf_counter() - t0
    t1 = min(t(1) for _ in range(3)); t3 = min(t(3) for _ in range(3))
    per = (t3 - t1) / 2
    print(f"{name}: {per*1e3:.1f}ms {total/per/1e9:.3f} GB/s bad={bad}", flush=True)
