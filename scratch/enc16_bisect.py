"""Deletion-bisect driver for the SUB=16 encode miscompile.

Runs scratch/enc16_scr.py (or a variant file passed as argv[1]) on ONE
batch of heterogeneous corpus chunks at ENC_SUB=16 on the DEVICE and
compares comp_lens against the interpret-mode golden (computed once on
CPU via the production SUB=8 kernel, which enc16_scr matches
bit-identically in interpret mode). Divergence = the miscompile signal
(matcher corruption shows as inflated sizes; no content check needed).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import importlib.util

path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scratch/enc16_scr.py"
spec = importlib.util.spec_from_file_location("variant", path)
ek = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ek)

from aircompressor_tpu.ops import snappy_encode_pallas as prod

data = open("/root/reference/testdata/urls.10K", "rb").read()
NB = 16
chunks = [data[i * 8192:(i + 1) * 8192] for i in range(NB)]
buf = np.zeros((NB, 65536), np.uint8)
lens = np.zeros(NB, np.int32)
for i, c in enumerate(chunks):
    buf[i, : len(c)] = np.frombuffer(c, np.uint8)
    lens[i] = len(c)
d, l = jnp.asarray(buf), jnp.asarray(lens)

res = ek.encode(d, l)
le = np.asarray(res[1])
if len(res) > 3:  # diag variant: (out, lens, ok, nseen, ncmp)
    print("nseen:", np.asarray(res[3]).tolist())
    print("ncmp: ", np.asarray(res[4]).tolist())
golden = np.asarray([1737, 1542, 1697, 1706, 1520, 1570, 1552, 1637,
                     1712, 1541, 1561, 1687, 1600, 1565, 1577, 1702])
# golden from production/interpret (verify once with PROD on device SUB=8)
_, lp, _ = prod.encode(d, l)
lp = np.asarray(lp)
print("prod(SUB=8, device):", lp.tolist())
print(f"variant(SUB={ek.SUB}):  ", le.tolist())
print("DIVERGED" if not np.array_equal(le, lp) else "MATCHES",
      f"(sum {le.sum()} vs {lp.sum()})")
