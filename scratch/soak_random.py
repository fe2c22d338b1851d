"""Long randomized differential soak (r5 endgame): batches of synthetic
chunks with adversarial entropy profiles and edge sizes, round-tripped
through the device batch codecs with CROSS-TIER differentials:

  device blob -> host decoder     (and upstream oracle where available)
  host blob   -> device decoder

Runs until WALL_BUDGET_S is spent or a failure is found; on failure the
(seed, iteration) pair reproduces it exactly. Appends a summary line to
scratch/soak_random_report.txt every report interval.
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

from aircompressor_tpu.deflate import DeflateCompressor, DeflateDecompressor
from aircompressor_tpu.lz4 import Lz4Compressor, Lz4Decompressor
from aircompressor_tpu.lzo import LzoCompressor, LzoDecompressor
from aircompressor_tpu.ops.batch import (
    DeflateBatchCodec,
    Lz4BatchCodec,
    LzoBatchCodec,
    SnappyBatchCodec,
    ZstdBatchCodec,
)
from aircompressor_tpu.snappy import SnappyCompressor, SnappyDecompressor
from aircompressor_tpu.zstd import ZstdCompressor, ZstdDecompressor

WALL_BUDGET_S = float(os.environ.get("SOAK_BUDGET_S", "18000"))
SEED = int(os.environ.get("SOAK_SEED", "20260820"))
BATCH = 32
EDGE_SIZES = [0, 1, 4, 5, 16, 127, 128, 129, 255, 256, 4095, 4096,
              65535, 65536]

CORPUS = open("/root/reference/testdata/urls.10K", "rb").read() + \
    open("/root/reference/testdata/house.jpg", "rb").read()


def make_chunk(rng):
    kind = int(rng.integers(0, 7))
    if int(rng.integers(0, 8)) == 0:
        n = int(EDGE_SIZES[int(rng.integers(0, len(EDGE_SIZES)))])
    else:
        n = int(rng.integers(0, 65537))
    if n == 0:
        return b""
    if kind == 0:  # pure random
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:  # low-entropy alphabet
        k = int(rng.integers(1, 17))
        return rng.integers(0, k, n, dtype=np.uint8).tobytes()
    if kind == 2:  # repeated words at varied distances
        words = [rng.integers(0, 256, int(m), dtype=np.uint8).tobytes()
                 for m in rng.integers(1, 600, 12)]
        parts = []
        total = 0
        while total < n:
            w = words[int(rng.integers(0, len(words)))]
            parts.append(w)
            total += len(w)
        return b"".join(parts)[:n]
    if kind == 3:  # periodic (overlap-copy stress), period 1..300
        p = int(rng.integers(1, 301))
        pat = rng.integers(0, 256, p, dtype=np.uint8).tobytes()
        return (pat * (n // p + 1))[:n]
    if kind == 4:  # long runs (RLE stress)
        parts = []
        total = 0
        while total < n:
            ln = int(rng.integers(1, 5000))
            parts.append(bytes([int(rng.integers(0, 256))]) * ln)
            total += ln
        return b"".join(parts)[:n]
    if kind == 5:  # corpus slice
        lo = int(rng.integers(0, max(len(CORPUS) - n, 1)))
        return CORPUS[lo : lo + n]
    # kind 6: corpus slice with random mutations
    lo = int(rng.integers(0, max(len(CORPUS) - n, 1)))
    arr = np.frombuffer(CORPUS[lo : lo + n], np.uint8).copy()
    if arr.size:
        k = int(rng.integers(1, max(arr.size // 50, 2)))
        idx = rng.integers(0, arr.size, k)
        arr[idx] = rng.integers(0, 256, k, dtype=np.uint8)
    return arr.tobytes()


D = "/root/reference/src/main/resources/aircompressor/linux-amd64"


def lib(n):
    p = os.path.join(D, n)
    return ctypes.CDLL(p, mode=os.RTLD_LAZY) if os.path.exists(p) else None


sn, l4, zs = lib("libsnappy.so"), lib("liblz4.so"), lib("libzstd.so")
if l4:
    l4.LZ4_decompress_safe.restype = ctypes.c_int
if zs:
    zs.ZSTD_decompress.restype = ctypes.c_size_t


def oracle_ok(name, blob, want):
    if name == "snappy" and sn and want:
        dec = ctypes.create_string_buffer(len(want) + 8)
        dn = ctypes.c_size_t(len(want) + 8)
        return (sn.snappy_uncompress(blob, len(blob), dec, ctypes.byref(dn))
                == 0 and dec.raw[: dn.value] == want)
    if name == "lz4" and l4:
        dec = ctypes.create_string_buffer(max(len(want), 1))
        m = l4.LZ4_decompress_safe(blob, dec, len(blob), len(want))
        return m == len(want) and dec.raw[: len(want)] == want
    if name == "deflate":
        import zlib
        try:
            return zlib.decompress(blob, -15, max(len(want), 1)) == want
        except zlib.error:
            return False
    if name == "zstd" and zs and want:
        dec = ctypes.create_string_buffer(len(want))
        m = zs.ZSTD_decompress(dec, len(want), blob, len(blob))
        return m == len(want) and dec.raw == want
    return True


def main():
    codecs = [
        ("snappy", SnappyBatchCodec(), SnappyCompressor.create(),
         SnappyDecompressor.create()),
        ("lz4", Lz4BatchCodec(), Lz4Compressor.create(),
         Lz4Decompressor.create()),
        ("lzo", LzoBatchCodec(), LzoCompressor.create(),
         LzoDecompressor.create()),
        ("zstd", ZstdBatchCodec(), ZstdCompressor.create(),
         ZstdDecompressor.create()),
        ("deflate", DeflateBatchCodec(), DeflateCompressor.create(6),
         DeflateDecompressor.create()),
    ]
    t0 = time.time()
    it = 0
    nchunks = 0
    nbytes = 0
    last_report = t0
    rng = np.random.default_rng(SEED)
    rep_path = "/root/repo/scratch/soak_random_report.txt"
    with open(rep_path, "a") as f:
        f.write(f"--- soak_random seed={SEED} start {time.strftime('%F %T')}"
                f" budget={WALL_BUDGET_S:.0f}s\n")
    while time.time() - t0 < WALL_BUDGET_S:
        chunks = [make_chunk(rng) for _ in range(BATCH)]
        # zstd batch codec rejects nothing but host tiers cap by len(c)
        for name, codec, hcomp, hdec in codecs:
            blobs = codec.compress_chunks(chunks)
            outs = codec.decompress_chunks(blobs)
            for i, (c, b, o) in enumerate(zip(chunks, blobs, outs)):
                assert o == c, (
                    f"FAIL {name} dev-roundtrip it={it} i={i} n={len(c)}")
                assert oracle_ok(name, b, c), (
                    f"FAIL {name} oracle it={it} i={i} n={len(c)}")
            # cross-tier: host blobs through the device decoder
            hblobs = [bytes(hcomp.compress(c)) for c in chunks]
            houts = codec.decompress_chunks(hblobs)
            for i, (c, o) in enumerate(zip(chunks, houts)):
                assert o == c, (
                    f"FAIL {name} host->dev it={it} i={i} n={len(c)}")
            # cross-tier: device blobs through the host decoder
            for i, (c, b) in enumerate(zip(chunks, blobs)):
                got = bytes(hdec.decompress(b, max(len(c), 1)))
                assert got == c, (
                    f"FAIL {name} dev->host it={it} i={i} n={len(c)}")
        it += 1
        nchunks += BATCH
        nbytes += sum(map(len, chunks))
        if time.time() - last_report > 600:
            last_report = time.time()
            line = (f"it={it} chunks={nchunks} MB={nbytes/1e6:.0f} "
                    f"elapsed={time.time()-t0:.0f}s all-pass")
            print(line, flush=True)
            with open(rep_path, "a") as f:
                f.write(line + "\n")
    line = (f"DONE seed={SEED}: {it} iterations, {nchunks} chunks, "
            f"{nbytes/1e6:.0f} MB, {time.time()-t0:.0f}s, ALL PASS")
    print(line, flush=True)
    with open(rep_path, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
