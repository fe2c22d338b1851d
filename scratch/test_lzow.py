"""Correctness of lzo_pallas_w vs ref tier (interpret on CPU)."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, jax.numpy as jnp
from aircompressor_tpu.ops import lzo_pallas_w as k
from aircompressor_tpu.lzo import LzoCompressor

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
         b"A" * 65536, b""]
comp = LzoCompressor.create()
blobs = [comp.compress(r) for r in raws]
buf, lens = _pack(blobs)
out, olens, ok = k.decode(buf, lens)
out, olens, ok = map(np.asarray, (out, olens, ok))
nbad = 0
for i, want in enumerate(raws):
    if not ok[i] or out[i, :olens[i]].tobytes() != want:
        print(f"chunk {i}: BAD ok={ok[i]} olen={olens[i]} want={len(want)}")
        nbad += 1
# malformed
data = open(f"{TESTDATA}/urls.10K", "rb").read()[:30000]
blob = comp.compress(data)
run = 67200
kk, term = divmod(run - 18, 255)
cases = [blob[:len(blob)//2],
         b"\x00" + b"\x00"*kk + bytes([term]) + b"A"*run + b"\x11\x00\x00",
         blob[:-3]]  # missing stop
buf2, lens2 = _pack(cases)
_, _, ok2 = k.decode(buf2, lens2)
ok2 = np.asarray(ok2)
for i in range(len(cases)):
    if ok2[i]:
        print(f"malformed case {i}: NOT flagged"); nbad += 1
print("BAD:", nbad)
