import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import ZstdBatchCodec

data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(32)]
codec = ZstdBatchCodec()
frames2 = codec.compress_chunks(chunks)
print("compressed", len(frames2), flush=True)
try:
    outs = codec.decompress_chunks(frames2)
    print("decode ok:", outs == chunks, flush=True)
except Exception as e:
    print("EXC:", e, flush=True)
    # bisect: decode frame 21 alone, and the host tier
    from aircompressor_tpu.zstd import frame_dec
    f = frames2[21]
    dst = np.zeros(CHUNK, np.uint8)
    n = frame_dec.decompress(np.frombuffer(f, np.uint8), dst)
    print("host tier decodes 21:", dst[:n].tobytes() == chunks[21], flush=True)
    try:
        outs1 = codec.decompress_chunks([f])
        print("device decodes 21 alone:", outs1[0] == chunks[21], flush=True)
    except Exception as e2:
        print("EXC solo:", e2, flush=True)
