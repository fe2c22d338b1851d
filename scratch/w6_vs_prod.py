"""Head-to-head: production snappy_pallas_w.decode vs w5 variants on the
same batch, same timing protocol (best-of-5, 3 reps folded)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import importlib.util

spec = importlib.util.spec_from_file_location(
    "snappy_w6", "/root/repo/scratch/snappy_w6.py")
w5 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(w5)

from aircompressor_tpu.ops import snappy_pallas_w as prod
from aircompressor_tpu.snappy import SnappyCompressor

TESTDATA = "/root/reference/testdata"
NB = int(os.environ.get("NB", "1024"))
names = ["urls.10K", "html", "geo.protodata", "kppkn.gtb", "house.jpg",
         "mapreduce-osdi-1.pdf", "large/bible.txt", "large/world192.txt"]
data = b"".join(open(os.path.join(TESTDATA, n), "rb").read()
                for n in names if os.path.exists(os.path.join(TESTDATA, n)))
data = data * (NB * 65536 // len(data) + 2)
comp = SnappyCompressor.create()
raws, blobs = [], []
for lo in range(0, len(data), 65536):
    c = data[lo:lo + 65536]
    if len(c) < 65536:
        break
    b = comp.compress(c)
    if len(b) <= 40960:
        raws.append(c)
        blobs.append(b)
    if len(raws) == NB:
        break
pairs = sorted(zip(blobs, raws), key=lambda p: len(p[0]))
blobs = [p[0] for p in pairs]
raws = [p[1] for p in pairs]
cap = 40960 + 1024
buf = np.zeros((NB, cap), np.uint8)
lens = np.zeros(NB, np.int32)
for i, b in enumerate(blobs):
    buf[i, :len(b)] = np.frombuffer(b, np.uint8)
    lens[i] = len(b)
d, l = jnp.asarray(buf), jnp.asarray(lens)
total = NB * 65536


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
out, olens, ok = prod.decode(d, l)
out_np, olens_np, ok_np = np.asarray(out), np.asarray(olens), np.asarray(ok)
bad = sum(1 for i in range(len(raws))
          if not ok_np[i] or out_np[i, :olens_np[i]].tobytes() != raws[i])
t = timeit(lambda: prod.decode(d, l)[1])
print(f"PROD G8 K8 : {t*1e3:7.2f} ms  {total/t/1e9:.3f} GB/s bad={bad}",
      flush=True)

for cfg in (sys.argv[1:] or ["16,4,8"]):
    parts = list(map(int, cfg.split(",")))
    SUBG, G, K = parts[:3]
    import importlib, os
    os.environ["W_SUBG"], os.environ["W_G"], os.environ["W_K"] = map(str, (SUBG, G, K))
    spec2 = importlib.util.spec_from_file_location(
        f"w6_{SUBG}_{G}_{K}", "/root/repo/scratch/snappy_w6.py")
    w6 = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(w6)
    M = 16
    impl = w6.decode
    out, olens, ok = impl(d, l)
    steps = [0]
    out_np, olens_np, ok_np = np.asarray(out), np.asarray(olens), np.asarray(ok)
    bad = sum(1 for i in range(len(raws))
              if not ok_np[i] or out_np[i, :olens_np[i]].tobytes() != raws[i])
    t = timeit(lambda: impl(d, l)[1])
    print(f"w6 SUBG{SUBG} G{G} K{K}: {t*1e3:7.2f} ms  {total/t/1e9:.3f} GB/s "
          f"bad={bad}", flush=True)
