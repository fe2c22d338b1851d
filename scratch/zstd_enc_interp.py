import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import ZstdBatchCodec

data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(32)]
codec = ZstdBatchCodec()
frames2 = codec.compress_chunks(chunks)
try:
    outs = codec.decompress_chunks(frames2[20:23])
    print("interp f20..23 ok:", outs == chunks[20:23], flush=True)
except Exception as e:
    print("interp EXC:", e, flush=True)
