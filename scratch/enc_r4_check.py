"""Grouped snappy encode kernel: device correctness vs libsnappy + timing."""
import sys, time, os, ctypes
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import _pack
from aircompressor_tpu.ops import snappy_encode_pallas as enc

lib = ctypes.CDLL('/root/reference/src/main/resources/aircompressor/linux-amd64/libsnappy.so', mode=os.RTLD_LAZY)
data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(64)]
buf, lens = _pack(chunks, CHUNK)
d, l = jnp.asarray(buf), jnp.asarray(lens)
comp, clens, ok = enc.encode(d, l)
comp_np, clens_np, ok_np = np.asarray(comp), np.asarray(clens), np.asarray(ok)
bad = int((~ok_np).sum()); mism = 0
ref_total = 0
for i, c in enumerate(chunks):
    b = comp_np[i, :clens_np[i]].tobytes()
    dec = ctypes.create_string_buffer(len(c)); dn = ctypes.c_size_t(len(c))
    if lib.snappy_uncompress(b, len(b), dec, ctypes.byref(dn)) != 0 or dec.raw[:dn.value] != c:
        mism += 1
    out = ctypes.create_string_buffer(len(c)+len(c)//6+32); on = ctypes.c_size_t(len(out))
    lib.snappy_compress(c, len(c), out, ctypes.byref(on)); ref_total += on.value
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(enc.encode(d, l)[1])
    best = min(best, time.perf_counter() - t0)
total = sum(map(len, chunks))
print(f"bad={bad} mism={mism} size={clens_np.sum()} ratio={clens_np.sum()/ref_total:.4f} "
      f"{best*1e3:.0f}ms {total/best/1e9:.4f} GB/s")
