import sys, os, ctypes, importlib.util
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import _pack
from aircompressor_tpu.snappy import block_ref
def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); return m
mod = load("enc_s16g1", "/root/repo/scratch/enc_s16g1.py")
data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(32)]
buf, lens = _pack(chunks, CHUNK)
comp, clens, ok = mod.encode(jnp.asarray(buf), jnp.asarray(lens))
comp_np, clens_np = np.asarray(comp), np.asarray(clens)
# reference encode via own host tier for byte-level diff
for i in (0, 1, 8, 9, 15, 16, 31):
    b = comp_np[i, :clens_np[i]].tobytes()
    out = np.zeros(len(chunks[i]), np.uint8)
    try:
        n = block_ref.decompress(np.frombuffer(b, np.uint8), out)
        good = out[:n].tobytes() == chunks[i]
        msg = "OK" if good else f"decodes but WRONG bytes (n={n})"
        if not good:
            exp = np.frombuffer(chunks[i], np.uint8)
            got = out[:n]
            m = min(len(exp), len(got))
            d0 = int(np.nonzero(exp[:m] != got[:m])[0][0]) if (exp[:m] != got[:m]).any() else -1
            msg += f" firstdiff@{d0}"
    except Exception as e:
        msg = f"MALFORMED: {str(e)[:60]}"
    print(f"chunk {i:2d} (sublane {i%16}): len={clens_np[i]} {msg}", flush=True)
