"""Unit tests for bench.py's measurement-discipline helpers (the frozen
corpus manifest and the pinned-baseline guard added in r5 — reference
protocol analogue: benchmark/CompressionBenchmark.java:42-60)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_load_corpus_manifest_frozen():
    m: dict = {}
    data = bench.load_corpus(manifest=m)
    assert len(data) == 16 << 20
    assert m["corpus_files"], "manifest must list the source files"
    # the frozen definition: order matches CORPUS_NAMES prefix
    names = [f["name"] for f in m["corpus_files"]]
    assert names == bench.CORPUS_NAMES[: len(names)]
    # deterministic: same bytes, same hash, on repeat
    m2: dict = {}
    assert bench.load_corpus(manifest=m2) == data
    assert m2["corpus_sha256_16"] == m["corpus_sha256_16"]


def test_pinned_baselines_applied_and_guarded(tmp_path, monkeypatch):
    pin_file = tmp_path / "pins.json"
    monkeypatch.setattr(bench, "_PIN_PATH", str(pin_file))

    # no pin file: detail untouched
    detail = {"corpus_sha256_16": "abc", "lz4_decode_liblz4_GBps": 2.0}
    bench._apply_pinned_baselines(detail)
    assert detail["lz4_decode_liblz4_GBps"] == 2.0
    assert "baseline_pinned_at" not in detail

    # matching corpus: pinned value replaces the measurement, which is
    # preserved alongside with its deviation
    pin_file.write_text(json.dumps({
        "pinned_at": "2026-08-20", "corpus_sha256_16": "abc",
        "rows": {"lz4_decode_liblz4_GBps": 2.5}}))
    detail = {"corpus_sha256_16": "abc", "lz4_decode_liblz4_GBps": 2.0}
    bench._apply_pinned_baselines(detail)
    assert detail["lz4_decode_liblz4_GBps"] == 2.5
    assert detail["lz4_decode_liblz4_GBps_measured"] == 2.0
    assert abs(detail["lz4_decode_liblz4_GBps_pin_deviation"] - (-0.2)) < 1e-9
    assert detail["baseline_pinned_at"] == "2026-08-20"

    # corpus mismatch: pins REFUSED (stale denominators would mask corpus
    # drift as kernel movement), run keeps its own measurement + a flag
    detail = {"corpus_sha256_16": "DIFFERENT", "lz4_decode_liblz4_GBps": 2.0}
    bench._apply_pinned_baselines(detail)
    assert detail["lz4_decode_liblz4_GBps"] == 2.0
    assert "baseline_pin_mismatch" in detail
    assert "baseline_pinned_at" not in detail
