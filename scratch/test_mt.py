"""Correctness check of snappy_pallas_mt vs the ref tier (interpret on CPU)."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from aircompressor_tpu.ops import snappy_pallas_w as mt
from aircompressor_tpu.snappy import SnappyCompressor

TESTDATA = "/root/reference/testdata"


def _pack(blobs):
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return jnp.asarray(buf), jnp.asarray(lens)


raws = []
for n in ("urls.10K", "geo.protodata", "html"):
    d = open(os.path.join(TESTDATA, n), "rb").read()
    raws += [d[lo: lo + 65536] for lo in range(0, min(len(d), 131072), 65536)]
rng = np.random.default_rng(3)
raws += [b"", b"x", b"ab" * 20000,
         bytes(rng.integers(0, 256, 4000, dtype=np.uint8))]

comp = SnappyCompressor.create()
blobs = [comp.compress(r) for r in raws]
buf, lens = _pack(blobs)
out, olens, ok, steps = mt.decode(buf, lens, with_steps=True)
out, olens, ok, steps = map(np.asarray, (out, olens, ok, steps))
nbad = 0
for i, want in enumerate(raws):
    if not ok[i]:
        print(f"chunk {i}: flagged bad (len {len(want)}) steps={steps[i]}")
        nbad += 1
        continue
    got = out[i, : olens[i]].tobytes()
    if got != want:
        k = next(j for j in range(min(len(got), len(want)) + 1)
                 if j >= len(got) or j >= len(want) or got[j] != want[j])
        print(f"chunk {i}: MISMATCH at {k} (olen {olens[i]} want {len(want)}) steps={steps[i]}")
        nbad += 1
    else:
        print(f"chunk {i}: ok, {len(want)}B in {steps[i]} steps "
              f"({len(want)/max(int(steps[i]),1):.1f} B/step)")
print("BAD:", nbad)
