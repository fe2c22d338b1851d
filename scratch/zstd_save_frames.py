import sys, pickle
sys.path.insert(0, "/root/repo")
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import ZstdBatchCodec
data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(32)]
codec = ZstdBatchCodec()
frames2 = codec.compress_chunks(chunks)
pickle.dump((chunks, frames2), open("/root/repo/scratch/zf.pkl", "wb"))
print("saved", len(frames2))
