"""Pallas megakernel decode tests (production _w kernels + the retained
snappy_pallas8 ablation baseline) — run in
interpret mode off-TPU, compiled on the real chip. Differential vs the own
ref tiers on corpus chunks + malformed flagging."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import TESTDATA, has_testdata

pytestmark = pytest.mark.skipif(not has_testdata(), reason="no testdata")


def _pack(blobs):
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return jnp.asarray(buf), jnp.asarray(lens)


def _chunks():
    import os

    raws = []
    for n in ("urls.10K", "geo.protodata"):
        d = open(os.path.join(TESTDATA, n), "rb").read()
        raws += [d[lo : lo + 65536] for lo in range(0, min(len(d), 131072), 65536)]
    rng = np.random.default_rng(3)
    raws += [b"", b"x", b"ab" * 20000,
             bytes(rng.integers(0, 256, 4000, dtype=np.uint8))]
    return raws


def _check(decode_fn, blobs, raws):
    buf, lens = _pack(blobs)
    out, olens, ok = decode_fn(buf, lens)
    out, olens, ok = np.asarray(out), np.asarray(olens), np.asarray(ok)
    for i, want in enumerate(raws):
        assert ok[i], f"chunk {i} flagged bad"
        assert out[i, : olens[i]].tobytes() == want, f"chunk {i} mismatch"


def test_snappy_megakernel_bit_exact():
    from aircompressor_tpu.ops import snappy_pallas8
    from aircompressor_tpu.snappy import SnappyCompressor

    raws = _chunks()
    comp = SnappyCompressor.create()
    _check(snappy_pallas8.decode, [comp.compress(r) for r in raws], raws)


def test_snappy_w_megakernel_bit_exact():
    from aircompressor_tpu.ops import snappy_pallas_w
    from aircompressor_tpu.snappy import SnappyCompressor

    raws = _chunks()
    comp = SnappyCompressor.create()
    _check(snappy_pallas_w.decode, [comp.compress(r) for r in raws], raws)


def test_snappy_w_megakernel_flags_truncated():
    from aircompressor_tpu.ops import snappy_pallas_w
    from aircompressor_tpu.snappy import SnappyCompressor

    data = open(f"{TESTDATA}/urls.10K", "rb").read()[:30000]
    blob = SnappyCompressor.create().compress(data)
    cases = [
        blob[: len(blob) // 2],             # truncated mid-stream
        blob[:1] + b"\x01\x00" + blob[3:],  # copy before any output
        b"\xfe\xff\xff\xff\x0f" + blob[5:],  # declared length > 64KB
    ]
    buf, lens = _pack(cases)
    _, _, ok = snappy_pallas_w.decode(buf, lens)
    assert not np.asarray(ok).any()



def test_lz4_w_megakernel_bit_exact():
    from aircompressor_tpu.lz4 import Lz4Compressor
    from aircompressor_tpu.ops import lz4_pallas_w

    raws = _chunks()
    comp = Lz4Compressor.create()
    _check(lz4_pallas_w.decode, [comp.compress(r) for r in raws], raws)


def test_lz4_w_megakernel_flags_malformed():
    from aircompressor_tpu.lz4 import Lz4Compressor
    from aircompressor_tpu.ops import lz4_pallas_w

    data = open(f"{TESTDATA}/urls.10K", "rb").read()[:30000]
    blob = Lz4Compressor.create().compress(data)
    run = 67200
    k, term = divmod(run - 15, 255)
    cases = [
        blob[: len(blob) // 2],              # truncated mid-stream
        b"\xf0" + blob[1:],                  # literal run overruns input
        blob[:1] + b"\x00\x00" + blob[3:],   # offset 0
        b"\xf0" + b"\xff" * k + bytes([term]) + b"A" * run,  # run > 64KB
    ]
    buf, lens = _pack(cases)
    out, olens, ok = lz4_pallas_w.decode(buf, lens)
    ok, out, olens = np.asarray(ok), np.asarray(out), np.asarray(olens)
    for i in range(len(cases)):
        assert (not ok[i]) or out[i, : olens[i]].tobytes() != data



def test_snappy_megakernel_flags_truncated():
    from aircompressor_tpu.ops import snappy_pallas8
    from aircompressor_tpu.snappy import SnappyCompressor

    data = open(f"{TESTDATA}/urls.10K", "rb").read()[:30000]
    blob = SnappyCompressor.create().compress(data)
    buf, lens = _pack([blob[: len(blob) // 2]])
    _, _, ok = snappy_pallas8.decode(buf, lens)
    assert not np.asarray(ok)[0]



def test_lzo_megakernel_flags_oversized_literal_run():
    """Same oversized-run bound for the LZO kernel (standalone literal run
    zero-extended past MAX_OUT)."""
    from aircompressor_tpu.ops import lzo_pallas_w

    # token 0x00 enters LENEXT with base acc 18; 263 zero bytes + term 117
    # -> run of 18 + 255*263 + 117 = 67200, then the literal bytes + stop
    run = 67200
    k, term = divmod(run - 18, 255)
    blob = (b"\x00" + b"\x00" * k + bytes([term]) + b"A" * run
            + b"\x11\x00\x00")  # M4 stop command
    buf, lens = _pack([blob])
    _, olens, ok = lzo_pallas_w.decode(buf, lens)
    assert not np.asarray(ok)[0]
