"""Drive the enc16_scr experiment: correctness (libsnappy oracle decode +
size parity vs production kernel) and throughput at a given ENC_SUB."""
import ctypes
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
    "enc_u", "/root/repo/scratch/enc_u.py")
ek = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ek)

from aircompressor_tpu.ops import snappy_encode_pallas as prod

TESTDATA = "/root/reference/testdata"
NB = int(os.environ.get("NB", "64"))
names = ["urls.10K", "html", "geo.protodata", "kppkn.gtb", "house.jpg",
         "mapreduce-osdi-1.pdf", "large/bible.txt", "large/world192.txt"]
data = b"".join(open(os.path.join(TESTDATA, n), "rb").read()
                for n in names if os.path.exists(os.path.join(TESTDATA, n)))
chunks = [data[i * 65536:(i + 1) * 65536] for i in range(NB)]
buf = np.zeros((NB, 65536), np.uint8)
lens = np.zeros(NB, np.int32)
for i, c in enumerate(chunks):
    buf[i, : len(c)] = np.frombuffer(c, np.uint8)
    lens[i] = len(c)
d, l = jnp.asarray(buf), jnp.asarray(lens)

snappy = ctypes.CDLL(
    "/root/reference/src/main/resources/aircompressor/linux-amd64/libsnappy.so",
    mode=os.RTLD_LAZY)


def oracle_ok(blob, want):
    dec = ctypes.create_string_buffer(len(want) + 8)
    dn = ctypes.c_size_t(len(want) + 8)
    rc = snappy.snappy_uncompress(bytes(blob), len(blob), dec,
                                  ctypes.byref(dn))
    return rc == 0 and dec.raw[: dn.value] == want


def timeit(fn, reps=3, trials=4):
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(reps)]
        for r in rs:
            np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


total = sum(map(len, chunks))

# production reference sizes + time
comp_p, lens_p, ok_p = prod.encode(d, l)
lens_pn = np.asarray(lens_p)
tp = timeit(lambda: prod.encode(d, l)[1])
print(f"PROD SUB=8   : {tp*1e3:8.2f} ms  {total/tp/1e9:.4f} GB/s  "
      f"size={int(lens_pn.sum())}", flush=True)

comp_e, lens_e, ok_e = ek.encode(d, l)
comp_en, lens_en, ok_en = (np.asarray(comp_e), np.asarray(lens_e),
                           np.asarray(ok_e))
bad = 0
for i, c in enumerate(chunks):
    blob = comp_en[i, : lens_en[i]].tobytes()
    if not (ok_en[i] and oracle_ok(blob, c)):
        bad += 1
te = timeit(lambda: ek.encode(d, l)[1])
print(f"SCR  SUB={ek.SUB:<4}: {te*1e3:8.2f} ms  {total/te/1e9:.4f} GB/s  "
      f"size={int(lens_en.sum())}  bad={bad}", flush=True)
