import sys, pickle
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
chunks, frames2 = pickle.load(open("/root/repo/scratch/zf.pkl", "rb"))
from aircompressor_tpu.ops import zstd_jax as zj
from aircompressor_tpu.ops import zstd_pallas
from aircompressor_tpu.zstd import device_prep as dp

def run_C(items):
    solos = [dp.plan_batch([f], zj.OUT_CAP) for f in items]
    plan = zj._merge_plans(solos)
    src_rows, src_words = zj._src_views(jnp.asarray(zj._pad_src(plan.src)))
    s_iters, s_params, s_tabs = zj._pack_seq(plan)
    ll, ml, of, s_rem, s_err = zstd_pallas.fse_sequences(
        jnp.asarray(s_iters), jnp.asarray(s_params), jnp.asarray(s_tabs),
        jnp.asarray(zj._SEQ_INFO), src_words, zj.SEQ_ROWS, False)
    return plan, np.asarray(ll), np.asarray(ml), np.asarray(of)

plan_s, ll_s, ml_s, of_s = run_C([frames2[21]])
plan_b, ll_b, ml_b, of_b = run_C(frames2[20:23])
bp_s = plan_s.frames[0].blocks[0]
bp_b = plan_b.frames[1].blocks[0]
n = bp_s.n_seq
rs, rb = bp_s.seq_out_base // 128, bp_b.seq_out_base // 128
rows = (n + 127) // 128
a = np.stack([ll_s[rs:rs+rows], ml_s[rs:rs+rows], of_s[rs:rs+rows]])
b = np.stack([ll_b[rb:rb+rows], ml_b[rb:rb+rows], of_b[rb:rb+rows]])
diff = (a != b)
# mask beyond n
lanes = np.arange(rows*128).reshape(rows, 128)
valid = lanes < n
diff = diff & valid[None]
print("nseq", n, "rows", rows, "mismatching entries:", int(diff.sum()), flush=True)
if diff.sum():
    idx = np.argwhere(diff)[:5]
    for fld, r, c in idx:
        print(f"  field{fld} seq{r*128+c}: solo={a[fld,r,c]} batch={b[fld,r,c]}", flush=True)
