import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import ZstdBatchCodec
from aircompressor_tpu.ops import zstd_jax as zj
from aircompressor_tpu.zstd import device_prep as dp

data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(32)]
codec = ZstdBatchCodec()
frames2 = codec.compress_chunks(chunks)

# plan the same launch decode_batch would build
solos = [dp.plan_batch([f], zj.OUT_CAP) for f in frames2]
batch, usage = [], (0,)*len(zj._LIMITS)
launches = []
for solo in solos:
    u = zj._usage(solo)
    s2 = tuple(a+b for a,b in zip(usage,u))
    if batch and not zj._fits(s2):
        launches.append(batch); batch, usage, s2 = [], (0,)*len(zj._LIMITS), u
    batch.append(solo); usage = s2
if batch: launches.append(batch)
print("launches:", [len(b) for b in launches], flush=True)
for li, b in enumerate(launches):
    plan = zj._merge_plans(b)
    out, meta, nf, nh, ns = zj._enqueue_plan(plan)
    out_n = np.asarray(out)
    meta_n = np.asarray(meta)
    n = len(plan.frames)
    out_len_n = meta_n[:nf][:n]
    okd = meta_n[nf:2*nf][:n]
    h_rem = meta_n[2*nf:2*nf+nh]
    s_rem = meta_n[2*nf+nh:2*nf+nh+ns]
    s_err = meta_n[2*nf+nh+ns:2*nf+nh+2*ns]
    print(f"launch {li}: kernelD ok={okd.tolist()}", flush=True)
    print(f"  h_rem nonzero slots: {np.nonzero(h_rem)[0].tolist()}", flush=True)
    print(f"  s_rem nonzero slots: {np.nonzero(s_rem)[0].tolist()} s_err: {np.nonzero(s_err)[0].tolist()}", flush=True)
    for f in range(n):
        fp = plan.frames[f]
        if fp.content_size >= 0 and out_len_n[f] != fp.content_size:
            print(f"  frame {f}: content_size {fp.content_size} != out_len {out_len_n[f]}", flush=True)
