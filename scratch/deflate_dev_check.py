"""Quick interpret-mode differential check of the deflate megakernel."""
import zlib, numpy as np, sys
sys.path.insert(0, '/root/repo')
from aircompressor_tpu.deflate import device_prep as dp
from aircompressor_tpu.ops import deflate_pallas_w as dk

rng = np.random.default_rng(3)
cases = [
    b"", b"x", b"hello world hello world hello",
    bytes(2000),
    b"ab" * 1500,
    bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
    bytes(rng.integers(0, 4, 4000, dtype=np.uint8)),
    (b"0123456789abcdef" * 32 + bytes(rng.integers(0, 256, 32, dtype=np.uint8))) * 6,
    open("/root/reference/testdata/html", "rb").read()[:8000],
]
blobs, raws = [], []
for lvl in (0, 1, 6, 9):
    for c in cases:
        co = zlib.compressobj(lvl, zlib.DEFLATED, -15)
        blobs.append(co.compress(c) + co.flush()); raws.append(c)
cap = max(len(b) for b in blobs) + 1
cap += (-cap) % 1024
buf = np.zeros((len(blobs), cap), np.uint8); lens = np.zeros(len(blobs), np.int32)
for i, b in enumerate(blobs):
    buf[i, :len(b)] = np.frombuffer(b, np.uint8); lens[i] = len(b)
desc, tabs, info = dp.plan_batch(buf, lens)
assert (info[:, 3] == dp.ST_OK).all(), info[:, 3]
pages, tr = dp.pack_pages(desc, tabs, info)
print("chunks", len(blobs), "tr", tr)
out, olens, ok = dk.decode(buf, lens, pages)
out, olens, ok = np.asarray(out), np.asarray(olens), np.asarray(ok)
bad = 0
for i, r in enumerate(raws):
    if not ok[i] or out[i, :olens[i]].tobytes() != r:
        bad += 1
        print("FAIL", i, "ok", ok[i], "olen", olens[i], "want", len(r))
        if bad > 4: break
print("bad =", bad)
