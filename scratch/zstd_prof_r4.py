"""Stage breakdown of the zstd device decode path: host plan, kernel A
(huffman), kernel C (fse), kernel D (execute), on the bench batch."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import zstandard
from bench import load_corpus, CHUNK
from aircompressor_tpu.zstd import device_prep as dp
from aircompressor_tpu.ops import zstd_jax as zj
from aircompressor_tpu.ops import zstd_pallas

data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(128)]
zc = zstandard.ZstdCompressor(level=3)
frames = [zc.compress(c) for c in chunks]
raw_bytes = sum(map(len, chunks))

# host planning time
t0 = time.perf_counter()
plans = [dp.plan_batch([f], zj.OUT_CAP) for f in frames]
t_plan = time.perf_counter() - t0
print(f"host plan: {t_plan*1e3:.1f} ms for {len(frames)} frames", flush=True)

# batch into launches like decode_batch does
batches = []
batch, usage = [], (0,)*len(zj._LIMITS)
for f, solo in zip(frames, plans):
    u = zj._usage(solo)
    s = tuple(a+b for a,b in zip(usage,u))
    if batch and not zj._fits(s):
        batches.append(batch); batch, usage, s = [], (0,)*len(zj._LIMITS), u
    batch.append(solo); usage = s
if batch: batches.append(batch)
print(f"{len(batches)} launches", flush=True)

t0 = time.perf_counter()
merged = [zj._merge_plans(b) for b in batches]
t_merge = time.perf_counter() - t0
print(f"merge: {t_merge*1e3:.1f} ms", flush=True)

interpret = False
# prepack all device inputs
packs = []
t0 = time.perf_counter()
for plan in merged:
    src_rows, src_words = zj._src_views(jnp.asarray(zj._pad_src(plan.src)))
    h_iters, h_params = zj._pack_huff(plan)
    s_iters, s_params, s_tabs = zj._pack_seq(plan)
    d_iters, d_frames, d_desc = zj._pack_frames(plan)
    packs.append((src_rows, src_words, jnp.asarray(h_iters), jnp.asarray(h_params),
                  jnp.asarray(s_iters), jnp.asarray(s_params), jnp.asarray(s_tabs),
                  jnp.asarray(d_iters), jnp.asarray(d_frames), jnp.asarray(d_desc)))
t_pack = time.perf_counter() - t0
print(f"pack+upload: {t_pack*1e3:.1f} ms", flush=True)

def timeit(fn, reps=2):
    best = 1e9
    for _ in range(reps+1):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    return best

# kernel A alone (all launches back-to-back, readback meta)
def run_A():
    outs = []
    for p in packs:
        litpad, h_rem = zstd_pallas.huffman_decode(p[2], p[3], p[0], zj.LIT_ROWS, interpret)
        outs.append(h_rem)
    for o in outs: np.asarray(o)
tA = timeit(run_A)
print(f"kernel A: {tA*1e3:.1f} ms", flush=True)

def run_C():
    outs = []
    for p in packs:
        ll, ml, of, s_rem, s_err = zstd_pallas.fse_sequences(p[4], p[5], p[6], jnp.asarray(zj._SEQ_INFO), p[1], zj.SEQ_ROWS, interpret)
        outs.append(s_rem)
    for o in outs: np.asarray(o)
tC = timeit(run_C)
print(f"kernel C: {tC*1e3:.1f} ms", flush=True)

# full pipeline incl. D (enqueue all, fetch all) with steps
full = []
for plan, p in zip(merged, packs):
    litpad, h_rem = zstd_pallas.huffman_decode(p[2], p[3], p[0], zj.LIT_ROWS, interpret)
    ll, ml, of, s_rem, s_err = zstd_pallas.fse_sequences(p[4], p[5], p[6], jnp.asarray(zj._SEQ_INFO), p[1], zj.SEQ_ROWS, interpret)
    seq3, litsrc = zj._exec_inputs(ll, ml, of, litpad, p[0])
    out, out_len, ok = zstd_pallas.execute(p[7], p[8], p[9], seq3, litsrc, zj.OUT_CAP//128, interpret)
    full.append((out_len, ok))
for o in full: np.asarray(o[0])

def run_ACD():
    outs = []
    for plan, p in zip(merged, packs):
        litpad, h_rem = zstd_pallas.huffman_decode(p[2], p[3], p[0], zj.LIT_ROWS, interpret)
        ll, ml, of, s_rem, s_err = zstd_pallas.fse_sequences(p[4], p[5], p[6], jnp.asarray(zj._SEQ_INFO), p[1], zj.SEQ_ROWS, interpret)
        seq3, litsrc = zj._exec_inputs(ll, ml, of, litpad, p[0])
        out, out_len, ok = zstd_pallas.execute(p[7], p[8], p[9], seq3, litsrc, zj.OUT_CAP//128, interpret)
        outs.append(out_len)
    for o in outs: np.asarray(o)
tACD = timeit(run_ACD)
print(f"A+C+D pipeline: {tACD*1e3:.1f} ms -> D ~= {(tACD-tA-tC)*1e3:.1f} ms (+exec_inputs)", flush=True)
print(f"raw {raw_bytes/1e6:.1f}MB; full-path GB/s (excl plan) = {raw_bytes/tACD/1e9:.4f}", flush=True)
print(f"incl plan+pack: {raw_bytes/(tACD+t_plan+t_merge+t_pack)/1e9:.4f} GB/s", flush=True)
