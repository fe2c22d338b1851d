import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import ZstdBatchCodec

data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(32)]
codec = ZstdBatchCodec()
frames2 = codec.compress_chunks(chunks)

def try_batch(label, items, expect):
    try:
        outs = codec.decompress_chunks(items)
        print(f"{label}: ok={outs == expect}", flush=True)
    except Exception as e:
        print(f"{label}: EXC {e}", flush=True)

# rotate by 5: frame 21 lands at slot 16
rot = frames2[5:] + frames2[:5]
rot_c = chunks[5:] + chunks[:5]
try_batch("rot5", rot, rot_c)
# 32 copies of frame 21
try_batch("only21x32", [frames2[21]]*32, [chunks[21]]*32)
# frames 16..24 (group 2 region) alone
try_batch("f16..24", frames2[16:24], chunks[16:24])
try_batch("f20..23", frames2[20:23], chunks[20:23])
