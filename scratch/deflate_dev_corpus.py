"""Full-corpus 64KB-chunk differential + malformed-input check on device."""
import zlib, time, numpy as np, sys
sys.path.insert(0, '/root/repo')
from aircompressor_tpu.deflate import device_prep as dp
from aircompressor_tpu.ops import deflate_pallas_w as dk

files = ["urls.10K", "html", "geo.protodata", "kppkn.gtb", "house.jpg",
         "mapreduce-osdi-1.pdf", "large/bible.txt", "large/world192.txt"]
corp = b"".join(open(f"/root/reference/testdata/{f}", "rb").read() for f in files)
corp = (corp * (16*1024*1024 // len(corp) + 1))[:16*1024*1024]
raws = [corp[o:o+65536] for o in range(0, len(corp), 65536)]
blobs = []
for i, r in enumerate(raws):
    co = zlib.compressobj((i % 9) + 1, zlib.DEFLATED, -15)
    blobs.append(co.compress(r) + co.flush())
cap = max(len(b) for b in blobs) + 1
cap += (-cap) % 1024
B = len(blobs)
buf = np.zeros((B, cap), np.uint8); lens = np.zeros(B, np.int32)
for i, b in enumerate(blobs):
    buf[i, :len(b)] = np.frombuffer(b, np.uint8); lens[i] = len(b)
t0 = time.time()
desc, tabs, info = dp.plan_batch(buf, lens)
t1 = time.time()
elig = (info[:, 3] == dp.ST_OK) & (lens <= 45056)
buf = buf[:, :46080]  # production _KERNEL_COMP_CAP discipline
print(f"B={B} cap={cap} eligible={elig.sum()}/{B} plan={t1-t0:.3f}s "
      f"maxblocks={info[:,1].max()} maxtab={info[:,2].max()}")
pages, tr = dp.pack_pages(desc, tabs, info)
print("tr", tr)
t0 = time.time()
out, olens, ok = dk.decode(buf, lens, pages)
out = np.asarray(out); olens = np.asarray(olens); ok = np.asarray(ok)
t1 = time.time()
bad = 0
for i, r in enumerate(raws):
    if not elig[i]:
        continue
    if not ok[i] or olens[i] != len(r) or out[i, :olens[i]].tobytes() != r:
        bad += 1
        if bad < 5:
            d = np.flatnonzero(out[i, :len(r)] != np.frombuffer(r, np.uint8))
            print("FAIL", i, "ok", ok[i], "olen", olens[i], len(r),
                  "firstdiff", d[:3] if len(d) else None)
print(f"bad={bad} wall={t1-t0:.2f}s (incl compile) out={sum(map(len,raws))/1e6:.1f}MB")

# malformed on device
bad_blobs = [b"\x07", b"\x05\x00", blobs[0][:20], b"\xfd\xff\xff",
             bytes([0x02, 0x00])]
bb = np.zeros((len(bad_blobs), 1024), np.uint8); bl = np.zeros(len(bad_blobs), np.int32)
for i, b in enumerate(bad_blobs):
    bb[i, :len(b)] = np.frombuffer(b, np.uint8); bl[i] = len(b)
d2, t2, i2 = dp.plan_batch(bb, bl)
print("malformed planner statuses:", i2[:, 3])
