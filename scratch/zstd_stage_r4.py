"""Stage-time the NEW decode_batch path on device."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import zstandard
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops import zstd_jax as zj
from aircompressor_tpu.zstd import device_prep as dp

data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(128)]
zc = zstandard.ZstdCompressor(level=3)
frames = [zc.compress(c) for c in chunks]
raw = sum(map(len, chunks))
assert zj._device_self_check()

for rep in range(3):
    t0 = time.perf_counter()
    solos = [dp.plan_batch([f], zj.OUT_CAP) for f in frames]
    t1 = time.perf_counter()
    # batch
    launches, batch, usage = [], [], (0,)*len(zj._LIMITS)
    for f, solo in zip(frames, solos):
        u = zj._usage(solo)
        s2 = tuple(a+b for a,b in zip(usage,u))
        if batch and not zj._fits(s2):
            launches.append(zj._merge_plans(batch)); batch, usage, s2 = [], (0,)*len(zj._LIMITS), u
        batch.append(solo); usage = s2
    if batch: launches.append(zj._merge_plans(batch))
    t2 = time.perf_counter()
    packed = [zj._pack_launch(p) for p in launches]
    t3 = time.perf_counter()
    src_all = jnp.asarray(np.stack([p[0] for p in packed]))
    blob_all = jnp.asarray(np.stack([p[1] for p in packed]))
    jax.block_until_ready(src_all); jax.block_until_ready(blob_all)
    t4 = time.perf_counter()
    run = zj._pipe_idx_fn(False)
    handles = [run(src_all, blob_all, k) for k in range(len(launches))]
    out_cat, meta_cat = zj._cat_fn()([h[0] for h in handles], [h[1] for h in handles])
    t5 = time.perf_counter()
    meta_np = np.asarray(meta_cat)
    t6 = time.perf_counter()
    out_np = np.asarray(out_cat)
    t7 = time.perf_counter()
    print(f"rep{rep}: plan {1e3*(t1-t0):.0f} batch {1e3*(t2-t1):.0f} pack {1e3*(t3-t2):.0f} "
          f"upload {1e3*(t4-t3):.0f} dispatch {1e3*(t5-t4):.0f} metaFetch {1e3*(t6-t5):.0f} "
          f"outFetch {1e3*(t7-t6):.0f} total {1e3*(t7-t0):.0f}ms", flush=True)
print(f"{raw/1e6:.1f}MB", flush=True)
