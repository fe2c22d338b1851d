"""Micro-profiling module tests (SURVEY §5.1 BenchmarkCount analogue)."""

from __future__ import annotations

import numpy as np
import pytest

from aircompressor_tpu.ops import profiling


def test_match_length_grid_exact_lengths():
    rows = profiling.match_length_grid(
        match_lengths=(8, 64), counts=(64,), trials=1)
    assert len(rows) == 2
    for r in rows:
        # segments match for match_len bytes (+ rare chance collisions
        # into the random separator)
        assert r["match_len"] <= r["mean_len"] < r["match_len"] + 1
        assert r["ns_per_candidate"] > 0


def test_kernel_rows_on_tpu():
    jax = pytest.importorskip("jax")
    if jax.default_backend() != "tpu":
        pytest.skip("kernel_rows needs the TPU backend")
    rows = profiling.kernel_rows(batch=32, trials=1)
    names = {r["kernel"] for r in rows}
    assert {"snappy_decode_megakernel", "lz4_decode_megakernel",
            "xxh64_stripe_kernel"} <= names
    for r in rows:
        assert r["GBps"] > 0


def test_trace_degrades_gracefully(tmp_path):
    with profiling.trace(str(tmp_path)):
        np.arange(4).sum()
