"""LZ4 device encode: ratio vs liblz4 + liblz4 decodes our output."""
import sys, time, os, ctypes
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import _pack
from aircompressor_tpu.ops import lz4_encode_pallas as enc

lib = ctypes.CDLL('/root/reference/src/main/resources/aircompressor/linux-amd64/liblz4.so', mode=os.RTLD_LAZY)
lib.LZ4_compress_default.restype = ctypes.c_int
lib.LZ4_decompress_safe.restype = ctypes.c_int
data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(64)]
buf, lens = _pack(chunks, CHUNK)
d, l = jnp.asarray(buf), jnp.asarray(lens)
comp, clens, ok = enc.encode(d, l)
comp_np, clens_np, ok_np = np.asarray(comp), np.asarray(clens), np.asarray(ok)
mism = 0; ref_total = 0
for i, c in enumerate(chunks):
    b = comp_np[i, :clens_np[i]].tobytes()
    dec = ctypes.create_string_buffer(len(c))
    r = lib.LZ4_decompress_safe(b, dec, len(b), len(c))
    if r != len(c) or dec.raw[:r] != c:
        mism += 1
    cap = len(c)+len(c)//255+16
    out = ctypes.create_string_buffer(cap)
    ref_total += lib.LZ4_compress_default(c, out, len(c), cap)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(enc.encode(d, l)[1])
    best = min(best, time.perf_counter() - t0)
total = sum(map(len, chunks))
print(f"bad={int((~ok_np).sum())} mism={mism} size={clens_np.sum()} ratio={clens_np.sum()/ref_total:.4f} "
      f"{best*1e3:.0f}ms {total/best/1e9:.4f} GB/s")
