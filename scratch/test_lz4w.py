"""Correctness of lz4_pallas_w vs ref tier (interpret on CPU)."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, jax.numpy as jnp
from aircompressor_tpu.ops import lz4_pallas_w as k
from aircompressor_tpu.lz4 import Lz4Compressor

TESTDATA = "/root/reference/testdata"

def _pack(blobs):
    cap = max(len(b) for b in blobs) + 1; cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8); lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, :len(b)] = np.frombuffer(b, np.uint8); lens[i] = len(b)
    return jnp.asarray(buf), jnp.asarray(lens)

raws = []
for n in ("urls.10K", "geo.protodata", "html"):
    d = open(os.path.join(TESTDATA, n), "rb").read()
    raws += [d[lo:lo+65536] for lo in range(0, min(len(d), 131072), 65536)]
rng = np.random.default_rng(3)
raws += [b"x", b"ab" * 20000, bytes(rng.integers(0, 256, 4000, dtype=np.uint8)),
         b"A" * 65536]
comp = Lz4Compressor.create()
blobs = [comp.compress(r) for r in raws]
buf, lens = _pack(blobs)
out, olens, ok, steps = k.decode(buf, lens, with_steps=True)
out, olens, ok, steps = map(np.asarray, (out, olens, ok, steps))
nbad = 0
for i, want in enumerate(raws):
    if not ok[i] or out[i, :olens[i]].tobytes() != want:
        print(f"chunk {i}: BAD ok={ok[i]} olen={olens[i]} want={len(want)}")
        nbad += 1
# malformed cases
data = open(f"{TESTDATA}/urls.10K", "rb").read()[:30000]
blob = comp.compress(data)
run = 67200
kk, term = divmod(run - 15, 255)
cases = [blob[:len(blob)//2], b"\xf0" + blob[1:],
         blob[:1] + b"\x00\x00" + blob[3:],
         b"\xf0" + b"\xff"*kk + bytes([term]) + b"A"*run]
buf2, lens2 = _pack(cases)
out2, ol2, ok2 = k.decode(buf2, lens2)
ok2, out2, ol2 = map(np.asarray, (ok2, out2, ol2))
for i in range(len(cases)):
    if ok2[i] and out2[i, :ol2[i]].tobytes() == data:
        print(f"malformed case {i}: NOT flagged"); nbad += 1
print("BAD:", nbad)
