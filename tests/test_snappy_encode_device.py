"""Snappy encode megakernel tests (ops/snappy_encode_pallas).

Off-TPU the kernel runs in Pallas interpret mode (Python-speed), so cases
stay small; size parity vs libsnappy is asserted on real corpus chunks.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import oracles  # noqa: E402
from aircompressor_tpu.ops import snappy_encode_pallas as sep  # noqa: E402
from aircompressor_tpu.snappy import SnappyRefDecompressor  # noqa: E402


def _encode(cases, cap=8192):
    buf = np.zeros((len(cases), cap), np.uint8)
    lens = np.zeros(len(cases), np.int32)
    for i, c in enumerate(cases):
        buf[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    out, clens, ok = sep.encode(jnp.asarray(buf), jnp.asarray(lens))
    out, clens, ok = np.asarray(out), np.asarray(clens), np.asarray(ok)
    assert ok.all()
    return [out[i, : clens[i]].tobytes() for i in range(len(cases))]


def test_round_trips_and_oracle_decodes():
    rng = np.random.default_rng(5)
    cases = [
        b"",
        b"a",
        b"hello world hello world hello world",
        bytes(3000),
        b"ab" * 2000,
        bytes(rng.integers(0, 256, 2500, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
        open("/root/reference/testdata/html", "rb").read()[:8000],
    ]
    blobs = _encode(cases)
    d = SnappyRefDecompressor()
    for c, b in zip(cases, blobs):
        assert bytes(d.decompress(b, len(c))) == c
        if oracles.snappy_lib() is not None:
            assert oracles.snappy_decompress(b, len(c)) == c


def test_size_parity_vs_libsnappy():
    if oracles.snappy_lib() is None:
        pytest.skip("libsnappy unavailable")
    data = open("/root/reference/testdata/html", "rb").read()
    cases = [data[i * 8192: (i + 1) * 8192] for i in range(4)]
    blobs = _encode(cases)
    ours = sum(map(len, blobs))
    ref = sum(len(oracles.snappy_compress(c)) for c in cases)
    # same greedy single-hash algorithm as libsnappy — sizes within 3%
    assert ours <= ref * 1.03, (ours, ref)


def test_lz4_encode_kernel():
    from aircompressor_tpu.lz4 import Lz4RefDecompressor
    from aircompressor_tpu.ops import lz4_encode_pallas as lep

    rng = np.random.default_rng(5)
    cases = [
        b"",
        b"a",
        b"hello world hello world hello world",
        bytes(3000),
        b"ab" * 2000,
        bytes(rng.integers(0, 256, 2500, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
        open("/root/reference/testdata/html", "rb").read()[:8000],
    ]
    buf = np.zeros((len(cases), 8192), np.uint8)
    lens = np.zeros(len(cases), np.int32)
    for i, c in enumerate(cases):
        buf[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    out, clens, ok = lep.encode(jnp.asarray(buf), jnp.asarray(lens))
    out, clens, ok = np.asarray(out), np.asarray(clens), np.asarray(ok)
    assert ok.all()
    d = Lz4RefDecompressor()
    tot_k = tot_l = 0
    for i, c in enumerate(cases):
        blob = out[i, : clens[i]].tobytes()
        assert bytes(d.decompress(blob, len(c))) == c, i
        if oracles.lz4_lib() is not None:
            assert oracles.lz4_decompress(blob, len(c)) == c, i
            tot_k += len(blob)
            tot_l += len(oracles.lz4_compress(c))
    if tot_l:
        # greedy matcher without liblz4's backward catch-up: within 3%
        assert tot_k <= tot_l * 1.03, (tot_k, tot_l)
