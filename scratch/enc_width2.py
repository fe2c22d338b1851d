import sys, time, os, ctypes, importlib.util
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import _pack
lib = ctypes.CDLL('/root/reference/src/main/resources/aircompressor/linux-amd64/libsnappy.so', mode=os.RTLD_LAZY)
def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); return m
data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(64)]
buf, lens = _pack(chunks, CHUNK)
d, l = jnp.asarray(buf), jnp.asarray(lens)
def check(mod, label):
    comp, clens, ok = mod.encode(d, l)
    comp_np, clens_np, ok_np = np.asarray(comp), np.asarray(clens), np.asarray(ok)
    bad = int((~ok_np).sum()); mism = 0
    for i, c in enumerate(chunks):
        b = comp_np[i, :clens_np[i]].tobytes()
        dec = ctypes.create_string_buffer(len(c)); dn = ctypes.c_size_t(len(c))
        if lib.snappy_uncompress(b, len(b), dec, ctypes.byref(dn)) != 0 or dec.raw[:dn.value] != c:
            mism += 1
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(mod.encode(d, l)[1])
        best = min(best, time.perf_counter() - t0)
    total = sum(map(len, chunks))
    print(f"{label}: bad={bad} mism={mism} size={clens_np.sum()} {best*1e3:.0f}ms {total/best/1e9:.4f} GB/s", flush=True)
for name in sys.argv[1:]:
    check(load(name, f"/root/repo/scratch/{name}.py"), name)
