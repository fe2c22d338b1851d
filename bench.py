"""Benchmark harness — prints ONE JSON line with the headline metric.

Analogue of the reference's JMH CompressionBenchmark (reference:
benchmark/CompressionBenchmark.java:42-156): corpus-driven throughput with
bytes/sec metrics, measured against the upstream native libraries as the
baseline (the same pinned .so binaries the reference ships as resources).

Headline: TPU chunk-parallel Snappy decode GB/s vs libsnappy on the host.
Detailed per-benchmark results go to BENCH_DETAIL.json.

The TPU pool this runs on has transient congestion episodes where every
dispatch degrades ~100×; a canary op detects them and trials retry, keeping
the best clean measurement (standard best-of-N JMH practice, adapted).
"""

from __future__ import annotations

import ctypes
import json
import os
import time

import numpy as np

TESTDATA = "/root/reference/testdata"
ORACLE_DIR = "/root/reference/src/main/resources/aircompressor/linux-amd64"
CHUNK = 65536
COMP_CAP = 76800  # compressed-chunk buffer ≥ max_compressed_length(64KB)


def load_corpus(max_bytes: int = 16 << 20) -> bytes:
    names = [
        "urls.10K", "html", "geo.protodata", "kppkn.gtb", "house.jpg",
        "mapreduce-osdi-1.pdf", "large/bible.txt", "large/world192.txt",
    ]
    blobs = []
    total = 0
    for n in names:
        p = os.path.join(TESTDATA, n)
        if os.path.exists(p):
            b = open(p, "rb").read()
            blobs.append(b)
            total += len(b)
            if total >= max_bytes:
                break
    data = b"".join(blobs)
    if len(data) < max_bytes:
        data = (data * (max_bytes // max(len(data), 1) + 1))
    return data[:max_bytes]


def best_of(fn, trials: int = 5, inner: int = 5) -> float:
    """Best mean-of-inner seconds across trials (canary-gated)."""
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(inner):
            fn()
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


# ------------------------------------------------------------------ device
def device_benchmarks(data: bytes, detail: dict) -> None:
    import jax
    import jax.numpy as jnp
    from aircompressor_tpu.ops import lz4_jax, snappy_jax, xxhash_jax
    from aircompressor_tpu.snappy import SnappyCompressor
    from aircompressor_tpu.lz4 import Lz4Compressor

    canary_x = jnp.zeros((16, 4096), jnp.int32)
    canary = jax.jit(lambda x: (x * jnp.int32(3)) ^ (x >> 7))

    def healthy() -> bool:
        jax.block_until_ready(canary(canary_x))
        t0 = time.perf_counter()
        jax.block_until_ready(canary(canary_x))
        return (time.perf_counter() - t0) < 0.005

    def gated_best(run, trials=4, patience_s=240.0):
        """Trials bracketed by healthy canaries; waits out congestion
        episodes (they last minutes) up to ``patience_s``."""
        best = float("inf")
        clean = 0
        deadline = time.monotonic() + patience_s
        while clean < trials and time.monotonic() < deadline:
            if not healthy():
                time.sleep(5.0)
                continue
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            if not healthy():  # episode began mid-trial; discard
                continue
            best = min(best, dt)
            clean += 1
        if best == float("inf"):
            # congested the whole window: report the degraded number honestly
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
        return best

    B = len(data) // CHUNK
    B = min(B, 128)
    chunks = [data[i * CHUNK : (i + 1) * CHUNK] for i in range(B)]

    # --- chunk-parallel decode kernels
    for name, comp_factory, dec in (
        ("snappy", SnappyCompressor.create, snappy_jax.decode),
        ("lz4", Lz4Compressor.create, lz4_jax.decode),
    ):
        comp = comp_factory()
        blobs = [comp.compress(c) for c in chunks]
        buf = np.zeros((B, COMP_CAP), np.uint8)
        lens = np.zeros(B, np.int32)
        for i, b in enumerate(blobs):
            buf[i, : len(b)] = np.frombuffer(b, np.uint8)
            lens[i] = len(b)
        d, l = jnp.asarray(buf), jnp.asarray(lens)
        r = dec(d, l)
        jax.block_until_ready(r)
        assert bool(np.asarray(r[2]).all()), f"{name} device decode failed"
        del r

        def run():
            r = dec(d, l)
            jax.block_until_ready(r)

        dt = gated_best(run)
        detail[f"{name}_decode_device_GBps"] = B * CHUNK / dt / 1e9
        del d, l

    # --- batched xxh64
    n_chunks = len(data) // CHUNK
    padded = np.frombuffer(data[: n_chunks * CHUNK], np.uint8).reshape(n_chunks, CHUNK)
    d = jnp.asarray(padded[:B])
    l = jnp.full((B,), CHUNK, jnp.int32)
    f = jax.jit(xxhash_jax.xxh64)
    jax.block_until_ready(f(d, l))

    def run_h():
        jax.block_until_ready(f(d, l))

    dt = gated_best(run_h)
    detail["xxh64_device_GBps"] = B * CHUNK / dt / 1e9


# -------------------------------------------------------------------- host
def host_baselines(data: bytes, detail: dict) -> None:
    """Upstream native libraries = the reference's own native tier."""
    n = len(data)

    def lib(name):
        path = os.path.join(ORACLE_DIR, name)
        return ctypes.CDLL(path, mode=os.RTLD_LAZY) if os.path.exists(path) else None

    snappy = lib("libsnappy.so")
    if snappy:
        out = ctypes.create_string_buffer(n + n // 6 + 32)
        on = ctypes.c_size_t(len(out))
        snappy.snappy_compress(data, n, out, ctypes.byref(on))
        comp = out.raw[: on.value]
        dec = ctypes.create_string_buffer(n)
        dn = ctypes.c_size_t(n)

        def run():
            snappy.snappy_uncompress(comp, len(comp), dec, ctypes.byref(ctypes.c_size_t(n)))

        detail["snappy_decode_libsnappy_GBps"] = n / best_of(run) / 1e9

    lz4 = lib("liblz4.so")
    if lz4:
        lz4.LZ4_compress_default.restype = ctypes.c_int
        lz4.LZ4_decompress_safe.restype = ctypes.c_int
        cap = n + n // 255 + 16
        out = ctypes.create_string_buffer(cap)
        m = lz4.LZ4_compress_default(data, out, n, cap)
        comp = out.raw[:m]
        dec = ctypes.create_string_buffer(n)

        def run():
            lz4.LZ4_decompress_safe(comp, dec, len(comp), n)

        detail["lz4_decode_liblz4_GBps"] = n / best_of(run) / 1e9

    xxh = lib("libxxhash.so")
    if xxh:
        xxh.XXH64.restype = ctypes.c_uint64

        def run():
            xxh.XXH64(data, n, 0)

        detail["xxh64_libxxhash_GBps"] = n / best_of(run) / 1e9

    # zstd level-3 sizes: ours vs libzstd (ratio parity metric)
    try:
        import zstandard

        from aircompressor_tpu.zstd import frame_enc

        sample = data[: 4 << 20]
        ours = frame_enc.compress_bytes(sample)
        theirs = zstandard.compress(sample, 3)
        assert zstandard.ZstdDecompressor().decompress(
            ours, max_output_size=len(sample)) == sample
        detail["zstd3_size_ratio_vs_libzstd"] = len(ours) / len(theirs)
    except Exception as e:  # noqa: BLE001
        detail["zstd3_size_ratio_error"] = str(e)


def main() -> None:
    data = load_corpus()
    detail = {"corpus_bytes": len(data)}
    host_baselines(data, detail)
    try:
        device_benchmarks(data, detail)
    except Exception as e:  # noqa: BLE001
        detail["device_error"] = str(e)
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)
    dev = detail.get("snappy_decode_device_GBps", 0.0)
    base = detail.get("snappy_decode_libsnappy_GBps", 0.0)
    print(json.dumps({
        "metric": "snappy_chunk_parallel_decode_device",
        "value": round(dev, 3),
        "unit": "GB/s",
        "vs_baseline": round(dev / base, 3) if base else 0.0,
    }))


if __name__ == "__main__":
    main()
