"""xxh64 device: SUSTAIN-batch timing + stripe-loop slope."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from aircompressor_tpu.ops import xxhash_pallas
from aircompressor_tpu.ops.xxhash_jax import xxh64 as ref_xxh64

B, L = 1024, 65536  # 64MB
rng = np.random.default_rng(0)
data = rng.integers(0, 256, (B, L), np.uint8)
d = jnp.asarray(data)
l = jnp.full((B,), L, jnp.int32)
r = xxhash_pallas.xxh64(d, l)
jax.block_until_ready(r)
# correctness spot check vs scalar tier on 2 rows
import aircompressor_tpu.xxhash as XX
h0 = (int(np.asarray(r[0])[0]) << 32) | int(np.asarray(r[1])[0])
assert h0 == XX.xxh64(data[0].tobytes()), "mismatch"
print("hash ok", flush=True)
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    rr = xxhash_pallas.xxh64(d, l)
    np.asarray(rr[0]); np.asarray(rr[1])
    best = min(best, time.perf_counter() - t0)
print(f"B={B} {B*L/1e6:.0f}MB best={best*1e3:.1f}ms -> {B*L/best/1e9:.2f} GB/s", flush=True)

# slope: same B, half L (32MB) to separate fixed vs per-byte cost
L2 = 32768
d2 = jnp.asarray(data[:, :L2].copy())
l2 = jnp.full((B,), L2, jnp.int32)
jax.block_until_ready(xxhash_pallas.xxh64(d2, l2))
best2 = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    rr = xxhash_pallas.xxh64(d2, l2)
    np.asarray(rr[0]); np.asarray(rr[1])
    best2 = min(best2, time.perf_counter() - t0)
print(f"L/2: best={best2*1e3:.1f}ms; marginal rate = {B*(L-L2)/ (best-best2)/1e9:.2f} GB/s", flush=True)
