"""Benchmark harness — prints ONE JSON line with the headline metric.

Analogue of the reference's JMH CompressionBenchmark (reference:
benchmark/CompressionBenchmark.java:42-156): corpus-driven throughput with a
bytes/sec metric, measured against the upstream native libraries as baseline
(the same pinned .so binaries the reference ships as resources).

Headline metric evolves with the framework; currently: batched device xxh64
throughput (the checksum kernel every frame format needs) vs libxxhash on the
host. Detailed per-benchmark results go to BENCH_DETAIL.json.
"""

from __future__ import annotations

import ctypes
import json
import os
import sys
import time

import numpy as np

TESTDATA = "/root/reference/testdata"
ORACLE_DIR = "/root/reference/src/main/resources/aircompressor/linux-amd64"
CHUNK = 65536


def load_corpus(max_bytes: int = 32 << 20) -> bytes:
    names = [
        "urls.10K", "html", "geo.protodata", "kppkn.gtb", "house.jpg",
        "mapreduce-osdi-1.pdf",
        "large/bible.txt", "large/world192.txt",
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
    data = b"".join(blobs)[:max_bytes]
    if not data:
        data = np.random.default_rng(0).integers(0, 256, size=1 << 20, dtype=np.uint8).tobytes()
    return data


def chunk_batch(data: bytes, chunk: int = CHUNK):
    n = len(data)
    n_chunks = (n + chunk - 1) // chunk
    padded = np.zeros((n_chunks, chunk), dtype=np.uint8)
    flat = np.frombuffer(data, dtype=np.uint8)
    full = n // chunk
    padded[:full] = flat[: full * chunk].reshape(full, chunk)
    lengths = np.full((n_chunks,), chunk, dtype=np.int32)
    if n % chunk:
        padded[full, : n % chunk] = flat[full * chunk:]
        lengths[full] = n % chunk
    return padded, lengths


def time_it(fn, warmup: int = 2, iters: int = 5) -> float:
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_xxh64_device(data: bytes) -> float:
    import jax
    import jax.numpy as jnp
    from aircompressor_tpu.ops import xxhash_jax

    padded, lengths = chunk_batch(data)
    d = jnp.asarray(padded)
    l = jnp.asarray(lengths)
    f = jax.jit(xxhash_jax.xxh64)
    run = lambda: jax.block_until_ready(f(d, l))
    dt = time_it(run)
    return len(data) / dt / 1e9


def bench_xxh64_baseline(data: bytes) -> float:
    path = os.path.join(ORACLE_DIR, "libxxhash.so")
    if not os.path.exists(path):
        return 0.0
    lib = ctypes.CDLL(path)
    lib.XXH64.restype = ctypes.c_uint64
    buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
    run = lambda: lib.XXH64(buf, len(data), 0)
    dt = time_it(run)
    return len(data) / dt / 1e9


def main() -> None:
    data = load_corpus()
    detail = {}
    dev = bench_xxh64_device(data)
    base = bench_xxh64_baseline(data)
    detail["xxh64_device_GBps"] = dev
    detail["xxh64_libxxhash_GBps"] = base
    detail["corpus_bytes"] = len(data)
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)
    vs = dev / base if base > 0 else 0.0
    print(json.dumps({
        "metric": "xxh64_batched_device_throughput",
        "value": round(dev, 3),
        "unit": "GB/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
