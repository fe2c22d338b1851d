"""Dedicated tests for the Pallas DFAST matcher (ops/zstd_dfast_pallas).

Reference semantics being stood in for: zstd's level-3 match finder
(zstd/DoubleFastBlockCompressor.java:39-170). The kernel is free to pick
different matches than the host matcher (the wire format constrains only
the emitted sequences), so the tests check the SOUNDNESS contract that
ops/zstd_encode_jax._device_matcher_batch relies on — structure, LZ77
content validity, coverage — plus a differential size bound vs the host
matcher (zstd/block_enc.find_sequences) on real corpus chunks.

VERDICT r4 #1c: these are the dedicated tests the matcher shipped without.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from aircompressor_tpu.ops import zstd_dfast_pallas as dk  # noqa: E402
from aircompressor_tpu.zstd import block_enc  # noqa: E402
from aircompressor_tpu.zstd.params import compute as _params  # noqa: E402


def _run_batch(chunks):
    sizes = [len(c) for c in chunks]
    cap = max(max(sizes), dk.LANES)
    cap += (-cap) % dk.LANES
    buf = np.zeros((len(chunks), cap), np.uint8)
    for i, c in enumerate(chunks):
        buf[i, : len(c)] = np.frombuffer(c, np.uint8)
    return dk.find_sequences_batch(
        jnp.asarray(buf), jnp.asarray(np.asarray(sizes, np.int32)))


def _check_sound(chunk: bytes, ll, ml, of, nseq: int, last: int):
    """Assert the full soundness contract for one chunk's sequences."""
    data = np.frombuffer(chunk, np.uint8)
    ll = ll[:nseq].astype(np.int64)
    ml = ml[:nseq].astype(np.int64)
    of = of[:nseq].astype(np.int64)
    assert (ll >= 0).all()
    assert (ml >= dk.MIN_MATCH).all()
    assert (of > 0).all()
    assert int(ll.sum() + ml.sum()) + last == len(chunk), "coverage"
    pos = np.cumsum(np.concatenate([[0], (ll + ml)[:-1]]))
    assert (of <= pos + ll).all(), "offset reaches before start"
    # content: every match byte equals the byte `offset` back
    seg0 = np.cumsum(ml) - ml
    span = np.arange(int(ml.sum()), dtype=np.int64)
    dst = np.repeat(pos + ll, ml) + (span - np.repeat(seg0, ml))
    bad = np.nonzero(data[dst] != data[dst - np.repeat(of, ml)])[0]
    assert bad.size == 0, f"match content wrong at flat index {bad[:5]}"


def _corpus_chunks():
    out = []
    for name in ("urls.10K", "html", "alice29.txt"):
        try:
            data = open(f"/root/reference/testdata/{name}", "rb").read()
        except OSError:
            try:
                data = open(
                    f"/root/reference/testdata/canterbury/{name}", "rb").read()
            except OSError:
                continue
        out += [data[i : i + 65536] for i in range(0, len(data), 65536)][:4]
    rng = np.random.default_rng(7)
    out.append(bytes(rng.integers(0, 256, 65536, dtype=np.uint8)))  # random
    out.append((b"the quick brown fox " * 40
                + bytes(rng.integers(0, 256, 160, dtype=np.uint8))) * 68)
    return [c for c in out if len(c) >= 64]


def test_corpus_chunks_sound_and_competitive():
    chunks = _corpus_chunks()
    ll, ml, of, nseq, last, ok = _run_batch(chunks)
    ll, ml, of = np.asarray(ll), np.asarray(ml), np.asarray(of)
    nseq, last, ok = np.asarray(nseq), np.asarray(last), np.asarray(ok)
    n_sound = 0
    dev_cov = host_cov = 0  # bytes covered by matches (ratio proxy)
    for i, c in enumerate(chunks):
        if not bool(ok[i]) or int(nseq[i]) == 0:
            continue
        _check_sound(c, ll[i], ml[i], of[i], int(nseq[i]), int(last[i]))
        n_sound += 1
        dev_cov += int(ml[i, : int(nseq[i])].sum())
        h_ll, h_of, h_ml, _ = _host_seqs(c)
        host_cov += int(h_ml.sum())
    # the matcher must engage on the compressible corpus chunks
    assert n_sound >= len(chunks) // 2, (n_sound, len(chunks))
    # and find a comparable volume of matches to the host matcher. On
    # current-Mosaic TPU the compiled kernel is sound but finds ~5x fewer
    # matches (DESIGN.md §8.4 divergence family) — which is exactly why
    # zstd_encode_jax._matcher_qualified() keeps real hardware on the host
    # matcher; here only soundness is load-bearing on device.
    if jax.default_backend() != "tpu":
        assert dev_cov >= host_cov * 0.85, (dev_cov, host_cov)
    else:
        assert dev_cov > 0, "matcher found nothing on device"


def _host_seqs(chunk: bytes):
    data = np.frombuffer(chunk, np.uint8)
    ll, offs, ml, lits = block_enc.find_sequences(
        data, _params(3, len(chunk)))
    return ll, offs, ml, lits


def test_structured_fuzz_sound():
    """Stitched-repeat fuzz (same family as the host matcher's fuzz): the
    kernel must stay structurally and content-sound on every trial."""
    rng = np.random.default_rng(991)
    chunks = []
    for _ in range(16):
        vocab = [rng.integers(0, 256, int(rng.integers(4, 900)),
                              dtype=np.uint8).tobytes() for _ in range(6)]
        parts = []
        total = 0
        limit = int(rng.integers(200, 65536))
        while total < limit:
            w = vocab[int(rng.integers(0, len(vocab)))]
            if rng.random() < 0.3:
                w = w[: int(rng.integers(1, len(w) + 1))]
            parts.append(w)
            total += len(w)
        chunks.append(b"".join(parts)[:limit])
    ll, ml, of, nseq, last, ok = _run_batch(chunks)
    ll, ml, of = np.asarray(ll), np.asarray(ml), np.asarray(of)
    nseq, last, ok = np.asarray(nseq), np.asarray(last), np.asarray(ok)
    for i, c in enumerate(chunks):
        if bool(ok[i]) and int(nseq[i]) > 0:
            _check_sound(c, ll[i], ml[i], of[i], int(nseq[i]), int(last[i]))


def test_edge_sizes():
    """Tiny / sub-margin / exact-capacity chunks must not crash and must
    report sound (possibly empty) sequence sets."""
    rng = np.random.default_rng(5)
    chunks = [
        b"A" * 64,
        b"ab" * 32768,  # exactly 64KB, maximally repetitive
        bytes(rng.integers(0, 4, 64, dtype=np.uint8)),
        b"x" * (dk.TAIL_MARGIN + dk.MIN_MATCH + 7),  # below kernel minimum
    ]
    ll, ml, of, nseq, last, ok = _run_batch(chunks)
    ll, ml, of = np.asarray(ll), np.asarray(ml), np.asarray(of)
    nseq, last, ok = np.asarray(nseq), np.asarray(last), np.asarray(ok)
    for i, c in enumerate(chunks):
        if bool(ok[i]) and int(nseq[i]) > 0:
            _check_sound(c, ll[i], ml[i], of[i], int(nseq[i]), int(last[i]))
        else:
            # fallback path: last_lit need not be meaningful, nseq==0 only
            assert int(nseq[i]) == 0 or not bool(ok[i])
