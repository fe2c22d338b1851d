import sys, pickle
sys.path.insert(0, "/root/repo")
chunks, frames2 = pickle.load(open("/root/repo/scratch/zf.pkl", "rb"))
from aircompressor_tpu.ops.batch import ZstdBatchCodec
codec = ZstdBatchCodec()
try:
    outs = codec.decompress_chunks(frames2[20:23])
    print("f20..23 ok:", outs == chunks[20:23], flush=True)
except Exception as e:
    print("EXC:", e, flush=True)
