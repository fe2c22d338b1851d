"""Zstd device decode tier: bit-exactness vs libzstd output.

Runs the three-kernel Pallas pipeline (ops/zstd_jax + ops/zstd_pallas) on
whatever backend is available — interpret mode on CPU, compiled on TPU —
and checks decode of libzstd frames at several levels is bit-exact.
Mirrors the reference's oracle strategy (AbstractTestZstd.java): decode
the third-party compressor's output and compare to the original.
"""

import numpy as np
import pytest

from tests import oracles
from tests.conftest import TESTDATA, has_testdata

pytestmark = pytest.mark.skipif(not has_testdata(), reason="no testdata")


def _load(name: str) -> bytes:
    import os

    return open(os.path.join(TESTDATA, name), "rb").read()


def _items():
    items, raws = [], []
    for name in ("urls.10K", "geo.protodata"):
        data = _load(name)[:131072]
        for lo in range(0, len(data), 65536):
            chunk = data[lo : lo + 65536]
            for level in (1, 3, 19):
                items.append(oracles.zstd_compress(chunk, level))
                raws.append(chunk)
    rng = np.random.default_rng(7)
    for extra in (b"", b"a", b"ab" * 3000,
                  bytes(rng.integers(0, 256, 5000, dtype=np.uint8))):
        items.append(oracles.zstd_compress(extra, 3))
        raws.append(extra)
    return items, raws


def test_device_decode_bit_exact():
    from aircompressor_tpu.ops import zstd_jax

    items, raws = _items()
    outs = zstd_jax.decode_batch(items)
    for i, (got, want) in enumerate(zip(outs, raws)):
        assert got == want, f"item {i}: {len(got)} vs {len(want)} bytes"


def test_device_decode_rejects_corrupt():
    from aircompressor_tpu.ops import zstd_jax
    from aircompressor_tpu.errors import MalformedInputException

    from aircompressor_tpu.zstd import frame_enc

    # our own frame writer always emits a content checksum (like the
    # reference, ZstdFrameCompressor.java:123-134), so a mid-stream bit
    # flip must be caught either structurally or by the checksum
    orig = _load("urls.10K")[:4096]
    blob = bytearray(frame_enc.compress_bytes(orig))
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(MalformedInputException):
        outs = zstd_jax.decode_batch([bytes(blob)], verify_checksums=True)
        # if structure happened to survive, the checksum must not
        assert outs[0] == orig


def test_device_decode_unequal_seq_counts_boundary():
    """Regression (r4): kernel C pads its iteration count to the CW window;
    when a LARGER co-batched stream pushes the padded count across a
    128-iteration flush boundary of a SMALLER stream, the in-loop flush
    stores-and-zeroes the smaller stream's final row — the final flush must
    then NOT overwrite it with the zeroed tile (found on device via the
    bench encode round trip, frame 21 of the frozen corpus)."""
    from aircompressor_tpu.ops import zstd_jax
    from aircompressor_tpu.zstd import device_prep as dp
    from aircompressor_tpu.zstd import frame_enc

    CW = 16  # ops/zstd_pallas.py kernel-C window
    text = _load("urls.10K")
    cands = []
    for size in (3072, 4096, 5120, 6144, 7168, 8192, 10240, 12288):
        raw = text[:size]
        frame = bytes(frame_enc.compress_bytes(raw))
        plan = dp.plan_batch([frame], zstd_jax.OUT_CAP)
        nseq = max((bp.n_seq for fp in plan.frames for bp in fp.blocks),
                   default=0)
        cands.append((nseq, frame, raw))
    pair = None
    for na, fa, ra in cands:
        for nb, fb, rb in cands:
            total = -(-max(na, nb) // CW) * CW
            if (na & 127) and total >= ((na >> 7) + 1) * 128 and nb > na:
                pair = ((fa, ra), (fb, rb))
                break
        if pair:
            break
    assert pair is not None, [c[0] for c in cands]
    (fa, ra), (fb, rb) = pair
    outs = zstd_jax.decode_batch([fa, fb])
    assert outs[0] == ra and outs[1] == rb
