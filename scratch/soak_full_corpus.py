"""Full-corpus device soak: round-trip EVERY file under the reference
testdata tree through all four device batch codecs, with upstream-library
oracle cross-checks on the compressed bytes (r5 endgame verification —
broader than the test suite's corpus, which samples a fixed file mix).

Writes a summary to scratch/soak_report.txt.
"""
import ctypes
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from aircompressor_tpu.ops.batch import (
    Lz4BatchCodec,
    LzoBatchCodec,
    SnappyBatchCodec,
    ZstdBatchCodec,
)

TESTDATA = "/root/reference/testdata"
D = "/root/reference/src/main/resources/aircompressor/linux-amd64"
CHUNK = 65536
BATCH = 128  # chunks per codec call


def lib(n):
    p = os.path.join(D, n)
    return ctypes.CDLL(p, mode=os.RTLD_LAZY) if os.path.exists(p) else None


sn = lib("libsnappy.so")
l4 = lib("liblz4.so")
zs = lib("libzstd.so")
if l4 is not None:
    l4.LZ4_decompress_safe.restype = ctypes.c_int
if zs is not None:
    zs.ZSTD_decompress.restype = ctypes.c_size_t


def oracle_check(codec_name, blob, want):
    """Upstream library decodes our compressed bytes (where one exists)."""
    if codec_name == "snappy" and sn is not None:
        dec = ctypes.create_string_buffer(len(want) + 8)
        dn = ctypes.c_size_t(len(want) + 8)
        rc = sn.snappy_uncompress(blob, len(blob), dec, ctypes.byref(dn))
        return rc == 0 and dec.raw[: dn.value] == want
    if codec_name == "lz4" and l4 is not None:
        dec = ctypes.create_string_buffer(len(want))
        n = l4.LZ4_decompress_safe(blob, dec, len(blob), len(want))
        return n == len(want) and dec.raw == want
    if codec_name == "zstd" and zs is not None:
        dec = ctypes.create_string_buffer(len(want))
        n = zs.ZSTD_decompress(dec, len(want), blob, len(blob))
        return n == len(want) and dec.raw == want
    return True  # lzo: no upstream lib binding here; own round trip only


def walk_files():
    for root, _dirs, files in os.walk(TESTDATA):
        for f in sorted(files):
            yield os.path.join(root, f)


def main():
    codecs = [("snappy", SnappyBatchCodec()), ("lz4", Lz4BatchCodec()),
              ("lzo", LzoBatchCodec()), ("zstd", ZstdBatchCodec())]
    chunks = []
    sources = []
    nfiles = 0
    for path in walk_files():
        data = open(path, "rb").read()
        nfiles += 1
        for lo in range(0, len(data), CHUNK):
            c = data[lo : lo + CHUNK]
            if c:
                chunks.append(c)
                sources.append(f"{os.path.relpath(path, TESTDATA)}@{lo}")
    total = sum(map(len, chunks))
    print(f"{nfiles} files, {len(chunks)} chunks, {total/1e6:.1f} MB",
          flush=True)

    report = [f"soak: {nfiles} files, {len(chunks)} chunks, "
              f"{total/1e6:.1f} MB, started {time.strftime('%F %T')}"]
    fail = 0
    for name, codec in codecs:
        t0 = time.perf_counter()
        comp_total = 0
        bad = []
        for lo in range(0, len(chunks), BATCH):
            batch = chunks[lo : lo + BATCH]
            blobs = codec.compress_chunks(batch)
            outs = codec.decompress_chunks(blobs)
            for i, (c, b, o) in enumerate(zip(batch, blobs, outs)):
                comp_total += len(b)
                if o != c or not oracle_check(name, b, c):
                    bad.append(sources[lo + i])
            print(f"  {name}: {min(lo+BATCH, len(chunks))}/{len(chunks)} "
                  f"chunks, bad={len(bad)}", flush=True)
        dt = time.perf_counter() - t0
        line = (f"{name}: ratio {comp_total/total:.4f}, "
                f"{total/dt/1e6:.1f} MB/s wall, bad={len(bad)}"
                + (f" FIRST={bad[:3]}" if bad else ""))
        report.append(line)
        print(line, flush=True)
        fail += len(bad)
    report.append(f"RESULT: {'PASS' if fail == 0 else f'FAIL({fail})'}")
    with open("/root/repo/scratch/soak_report.txt", "w") as f:
        f.write("\n".join(report) + "\n")
    print(report[-1], flush=True)


if __name__ == "__main__":
    main()
