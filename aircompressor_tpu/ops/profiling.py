"""Per-kernel micro-profiling — the BenchmarkCount/JMH analogue (SURVEY §5.1).

The reference does performance work with JMH plus targeted micro-benchmarks
of single primitives (reference: lz4/BenchmarkCount.java:40-59 benchmarks
only the ``count()`` match-length primitive over a matchLength×padding
grid; benchmark/BytesCounter.java converts to bytes/sec). The TPU
equivalents here:

- ``match_length_grid()`` — the direct BenchmarkCount analogue: times the
  shared vectorized match-length primitive (zstd/block_enc._match_lengths,
  also used by the LZO matcher) over a match-length × candidate-count grid,
  reporting ns per resolved candidate. Runs on the host (numpy).
- ``kernel_rows()`` — times each device kernel (decode megakernels,
  xxh64 stripe kernel) on synthetic batches with
  readback-observed completion and reports GB/s, ns per loop iteration and
  bytes per iteration: on these iteration-bound kernels the honest
  "roofline" is the while-loop floor (~143ns/iteration on v5e, measured),
  not HBM bandwidth — the table shows how close each kernel runs to it.
- ``trace()`` — context manager around ``jax.profiler.trace`` for XLA/TPU
  timeline capture (viewable with tensorboard/xprof), the jax.profiler
  half of SURVEY §5.1.

CLI: ``python -m aircompressor_tpu.ops.profiling [outdir]``.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

HBM_GBPS_V5E = 819.0  # v5e HBM bandwidth, roofline reference
LOOP_FLOOR_NS = 143.0  # measured lax.while_loop per-iteration floor (v5e)


# ----------------------------------------------------------------- primitives
def match_length_grid(match_lengths=(8, 64, 512, 4096),
                      counts=(64, 4096),
                      trials: int = 3) -> list[dict]:
    """BenchmarkCount analogue (reference lz4/BenchmarkCount.java:40-59):
    cost of the match-length primitive per candidate over a grid."""
    from ..zstd import block_enc

    rows = []
    rng = np.random.default_rng(0)
    for mlen in match_lengths:
        for cnt in counts:
            # cnt segments of [random(mlen) ×2 + unique separator]: each
            # second copy matches the first for EXACTLY mlen bytes
            seg = 2 * mlen + 16
            block = rng.integers(0, 256, cnt * seg + 64, dtype=np.uint8)
            for k in range(cnt):
                base = k * seg
                block[base + mlen: base + 2 * mlen] = block[base: base + mlen]
            n = block.size
            pos = np.arange(cnt, dtype=np.int64) * seg + mlen
            cand = pos - mlen
            w8 = block_enc._u64_windows(block)
            best = float("inf")
            for _ in range(trials):
                breaks = block_enc._PeriodBreaks(block)
                t0 = time.perf_counter()
                out = block_enc._match_lengths(w8, pos, cand, n, breaks)
                best = min(best, time.perf_counter() - t0)
            rows.append({
                "primitive": "match_lengths",
                "match_len": mlen,
                "candidates": cnt,
                "ns_per_candidate": best / cnt * 1e9,
                "mean_len": float(out.mean()),
            })
    return rows


# -------------------------------------------------------------- device kernels
def _mk_batch(compress, chunks, align: int = 1024):
    blobs = [compress(c) for c in chunks]
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % align
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return buf, lens


def kernel_rows(data: bytes | None = None, batch: int = 256,
                trials: int = 3) -> list[dict]:
    """Readback-timed per-kernel rows: GB/s, ns/iteration, bytes/iteration.

    Requires a TPU backend (the megakernels' interpret fallback is
    Python-speed and would not measure anything meaningful)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        raise RuntimeError("kernel_rows needs a TPU backend")

    from ..lz4 import Lz4Compressor
    from ..snappy import SnappyCompressor
    from . import lz4_pallas_w, snappy_pallas_w, xxhash_pallas

    if data is None:
        rng = np.random.default_rng(0)
        word = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
        data = b"".join(
            word[: 8 + int(x)] for x in rng.integers(0, 56, 3 * batch * 1024))
    chunk = 65536
    chunks = [data[i * chunk: (i + 1) * chunk]
              for i in range(min(batch, len(data) // chunk))]
    raw = sum(map(len, chunks))
    rows = []

    for name, comp_factory, dec, sub in (
        ("snappy_decode_megakernel", SnappyCompressor.create,
         snappy_pallas_w.decode, snappy_pallas_w.SUB),
        ("lz4_decode_megakernel", Lz4Compressor.create, lz4_pallas_w.decode,
         lz4_pallas_w.SUB),
    ):
        buf, lens = _mk_batch(comp_factory().compress, chunks)
        d, l = jnp.asarray(buf), jnp.asarray(lens)
        out, olens, ok, steps = dec(d, l, with_steps=True)
        assert bool(np.asarray(ok).all())
        steps_np = np.asarray(steps)
        # grid-sequential: total loop iterations = Σ per-grid-step max
        grid_iters = sum(
            int(steps_np[i: i + sub].max())
            for i in range(0, len(chunks), sub))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            r = dec(d, l)
            np.asarray(r[1]), np.asarray(r[2])
            best = min(best, time.perf_counter() - t0)
        ns_iter = best / grid_iters * 1e9
        rows.append({
            "kernel": name, "GBps": raw / best / 1e9,
            "loop_iterations": grid_iters,
            "ns_per_iteration": ns_iter,
            "bytes_per_iteration": raw / grid_iters,
            "x_over_loop_floor": ns_iter / LOOP_FLOOR_NS,
        })

    # xxh64 stripe kernel: bandwidth-shaped, compare against HBM roofline
    # (the kernel requires the batch to be a multiple of 128 rows)
    hb = max(128, (len(chunks) // 128) * 128)
    padded = np.frombuffer((data * (hb * chunk // len(data) + 1))[: hb * chunk],
                           np.uint8).reshape(hb, chunk)
    d = jnp.asarray(padded)
    l = jnp.full((hb,), chunk, jnp.int32)
    np.asarray(xxhash_pallas.xxh64(d, l)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(xxhash_pallas.xxh64(d, l)[0])
        best = min(best, time.perf_counter() - t0)
    gbps = padded.size / best / 1e9
    rows.append({
        "kernel": "xxh64_stripe_kernel", "GBps": gbps,
        "pct_of_hbm_roofline": 100.0 * gbps / HBM_GBPS_V5E,
    })
    return rows


@contextlib.contextmanager
def trace(outdir: str):
    """jax.profiler trace capture (SURVEY §5.1); view with xprof/tensorboard.

    Degrades to a no-op when the backend's profiler is unavailable (the
    tunneled dev pool does not always export a profiler port)."""
    import jax

    try:
        jax.profiler.start_trace(outdir)
        started = True
    except Exception:  # noqa: BLE001
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:  # noqa: BLE001
                pass


def main() -> None:
    import contextlib
    import json
    import sys

    report = {"match_length_grid": match_length_grid()}
    ctx = trace(sys.argv[1]) if len(sys.argv) > 1 else contextlib.nullcontext()
    with ctx:  # the trace must wrap the device work it is meant to capture
        try:
            report["kernels"] = kernel_rows()
        except Exception as e:  # noqa: BLE001
            report["kernels_error"] = str(e)[:200]
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
