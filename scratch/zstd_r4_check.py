"""End-to-end zstd device decode on TPU: correctness vs zstandard oracle +
timing of the new fused-pipe path on the bench batch."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import zstandard
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import ZstdBatchCodec

data = load_corpus()
chunks = [data[i*CHUNK:(i+1)*CHUNK] for i in range(128)]
zc = zstandard.ZstdCompressor(level=3)
frames = [zc.compress(c) for c in chunks]
raw_bytes = sum(map(len, chunks))
codec = ZstdBatchCodec()
t0 = time.perf_counter()
outs = codec.decompress_chunks(frames)
t_first = time.perf_counter() - t0
assert outs == chunks, "MISMATCH"
print(f"OK bit-exact 128 frames (first call {t_first:.1f}s incl compile)", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    codec.decompress_chunks(frames)
    best = min(best, time.perf_counter() - t0)
print(f"raw={raw_bytes/1e6:.1f}MB best={best*1e3:.1f}ms -> {raw_bytes/best/1e9:.4f} GB/s", flush=True)
