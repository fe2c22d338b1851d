"""Structured differential fuzz of the DEVICE decode tiers.

Seeded random segment-stitched inputs (runs, repeats at varied distances,
random bytes — the shapes that stress LZ grammars) compress through the
host tiers and decode through the batch codecs' device paths; outputs must
be bit-exact. Mirrors the reference's RandomGenerator-based stress
(snappy/RandomGenerator.java) across all device codecs, plus mutation
fuzz: random single-byte corruptions must either be flagged or produce
output that differs from the original (never a silent wrong 'ok')."""

from __future__ import annotations

import numpy as np
import pytest

from aircompressor_tpu.errors import MalformedInputException


def _structured_inputs(seed: int, n: int, max_len: int = 65536):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        parts = []
        total = 0
        target = int(rng.integers(1, max_len))
        while total < target:
            kind = rng.integers(0, 4)
            if kind == 0:  # literal noise
                k = int(rng.integers(1, 400))
                parts.append(rng.integers(0, 256, k, dtype=np.uint8).tobytes())
            elif kind == 1:  # byte run
                k = int(rng.integers(4, 3000))
                parts.append(bytes([int(rng.integers(0, 256))]) * k)
            elif kind == 2 and parts:  # repeat an earlier segment (match)
                j = int(rng.integers(0, len(parts)))
                parts.append(parts[j])
            else:  # low-entropy text-ish
                k = int(rng.integers(10, 800))
                parts.append(bytes((rng.integers(97, 101, k))))
            total = sum(map(len, parts))
        out.append(b"".join(parts)[:target])
    return out


@pytest.mark.parametrize("codec", ["snappy", "lz4", "lzo", "deflate"])
def test_device_decode_structured_fuzz(codec):
    from aircompressor_tpu.ops import batch

    cls = {"snappy": batch.SnappyBatchCodec, "lz4": batch.Lz4BatchCodec,
           "lzo": batch.LzoBatchCodec,
           "deflate": batch.DeflateBatchCodec}[codec]
    c = cls()
    raws = _structured_inputs(seed=hash(codec) % 1000, n=24)
    blobs = c.compress_chunks(raws)
    outs = c.decompress_chunks(blobs)
    assert outs == raws


def test_zstd_device_decode_structured_fuzz():
    from aircompressor_tpu.ops.batch import ZstdBatchCodec

    c = ZstdBatchCodec()
    raws = _structured_inputs(seed=77, n=16)
    blobs = c.compress_chunks(raws)
    outs = c.decompress_chunks(blobs)
    assert outs == raws


@pytest.mark.parametrize("codec", ["snappy", "lz4", "lzo", "zstd",
                                   "deflate"])
def test_device_decode_mutation_fuzz(codec):
    """Single-byte corruptions: the batch decode must raise, or (for
    positions that keep the stream well-formed, e.g. inside literal
    bytes) produce output differing from the original — never a silent
    equal-looking success for every mutant AND a crash-free pipeline."""
    from aircompressor_tpu.ops import batch

    cls = {"snappy": batch.SnappyBatchCodec, "lz4": batch.Lz4BatchCodec,
           "lzo": batch.LzoBatchCodec, "zstd": batch.ZstdBatchCodec,
           "deflate": batch.DeflateBatchCodec}[codec]
    c = cls()
    raw = _structured_inputs(seed=5, n=1, max_len=30000)[0]
    blob = bytearray(c.compress_chunks([raw])[0])
    rng = np.random.default_rng(9)
    flagged = 0
    # the first bytes are stream/block headers in every format here —
    # flips there must be detectable even for checksum-less wire formats
    # (raw deflate: a random flip inside Huffman payload often yields a
    # valid-but-different stream, which the out != raw branch covers)
    positions = [0, 1, 2, 3] + [int(rng.integers(0, len(blob)))
                                for _ in range(12)]
    for i in positions:
        mut = bytes(blob[:i]) + bytes([blob[i] ^ 0x5A]) + bytes(blob[i + 1:])
        try:
            out = c.decompress_chunks([mut])[0]
        except MalformedInputException:
            flagged += 1
            continue  # flagged: good
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"non-contract exception for mutant @{i}: {e!r}")
        # decoded without error: the output must REFLECT the corruption —
        # a mutant that decodes cleanly to bytes equal to the original
        # would be a silent equal-looking success (every mutated position
        # here is inside decoded payload or a header/checksum the decoder
        # must check; none is format-ignored)
        assert out != raw, f"mutant @{i} decoded silently equal to original"
        # and the call must never corrupt unrelated state (decode the good
        # blob again to prove it)
        assert c.decompress_chunks([bytes(blob)])[0] == raw
    assert flagged > 0  # at least some corruptions must be detected


@pytest.mark.parametrize("codec", ["lz4", "snappy", "lzo", "lz4frame",
                                   "snappyframed", "zstd", "zstd_inc"])
def test_host_decoder_exception_contract(codec):
    """Mutation fuzz of the HOST decoders: every corruption outcome must be
    success or MalformedInputException — never an unwrapped internal error
    (the reference's bounds-check discipline, MalformedInputException with
    offsets)."""
    data = open("/root/reference/testdata/urls.10K", "rb").read()[:30_000]
    if codec == "lz4":
        from aircompressor_tpu.lz4 import Lz4RefCompressor, Lz4RefDecompressor

        blob = bytes(Lz4RefCompressor().compress(data))
        dec = lambda b: Lz4RefDecompressor().decompress(b, len(data))  # noqa: E731
    elif codec == "snappy":
        from aircompressor_tpu.snappy import SnappyRefCompressor, SnappyRefDecompressor

        blob = bytes(SnappyRefCompressor().compress(data))
        dec = lambda b: SnappyRefDecompressor().decompress(b, len(data))  # noqa: E731
    elif codec == "lzo":
        from aircompressor_tpu.lzo import LzoCompressor, LzoDecompressor

        blob = bytes(LzoCompressor().compress(data))
        dec = lambda b: LzoDecompressor().decompress(b, len(data))  # noqa: E731
    elif codec == "lz4frame":
        from aircompressor_tpu.lz4 import Lz4RefCompressor, Lz4RefDecompressor
        from aircompressor_tpu.lz4.frame_codec import (
            Lz4FrameCompressor,
            Lz4FrameDecompressor,
        )

        blob = bytes(Lz4FrameCompressor(Lz4RefCompressor()).compress(data))
        dec = lambda b: Lz4FrameDecompressor(  # noqa: E731
            Lz4RefDecompressor()).decompress(b, len(data))
    elif codec == "snappyframed":
        from aircompressor_tpu.snappy.framed import compress_framed, decompress_framed

        blob = bytes(compress_framed(data))
        dec = decompress_framed
    elif codec == "zstd":
        from aircompressor_tpu.zstd import frame_dec, frame_enc

        blob = frame_enc.compress_bytes(data)

        def dec(b):
            dst = np.zeros(len(data) + 64, np.uint8)
            frame_dec.decompress(np.frombuffer(b, np.uint8), dst)
    else:
        from aircompressor_tpu.zstd import frame_enc
        from aircompressor_tpu.zstd.streams import ZstdIncrementalFrameDecompressor

        blob = frame_enc.compress_bytes(data)

        def dec(b):
            d = ZstdIncrementalFrameDecompressor()
            d.partial_decompress(b[: len(b) // 2])
            d.partial_decompress(b[len(b) // 2 :])

    rng = np.random.default_rng(len(codec))
    for _ in range(60):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(b)))
            b[i] ^= int(rng.integers(1, 256))
        try:
            dec(bytes(b))
        except MalformedInputException:
            pass


def test_selfcheck_payload_is_genuinely_mixed():
    """The kernel-gating canary must contain BOTH compressible text and an
    incompressible stretch (r5 review finding: a plain [:65536] truncation
    silently dropped the random tail, reducing every self-check to pure
    text — the exact weakness the payload was built to fix)."""
    import numpy as np

    from aircompressor_tpu.ops.batch import _selfcheck_payload

    p = np.frombuffer(_selfcheck_payload(), np.uint8)
    assert p.size >= 60000  # production-size
    # last 8KB: uniform random bytes (mean ~127.5, full range)
    tail = p[-8192:]
    assert abs(float(tail.mean()) - 127.5) < 5.0
    assert tail.min() < 16 and tail.max() > 239
    # head: printable text (compressible)
    head = p[:-8192]
    assert head.size > 40000 and head.max() < 127 and head.min() >= 32


def test_batch_decode_oversized_blobs_fall_back_to_host():
    """Incompressible ~64KB chunks produce blobs LARGER than the decode
    megakernels' VMEM geometry can batch (r5 full-corpus soak finding:
    scoped-vmem OOM at compile); the batch API must route them to the
    host tier instead of crashing — mixed batches stay exact."""
    import numpy as np

    from aircompressor_tpu.ops.batch import (
        _KERNEL_COMP_CAP,
        Lz4BatchCodec,
        LzoBatchCodec,
        SnappyBatchCodec,
    )

    rng = np.random.default_rng(77)
    incompressible = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    text = (b"the quick brown fox jumps over the lazy dog " * 1490)[:65536]
    chunks = [incompressible, text, incompressible[:30000], text[:10000]]
    for cls in (SnappyBatchCodec, Lz4BatchCodec, LzoBatchCodec):
        codec = cls()
        blobs = codec.compress_chunks(chunks)
        assert max(len(b) for b in blobs) > _KERNEL_COMP_CAP, (
            cls.__name__, "test premise: an oversized blob must exist")
        assert codec.decompress_chunks(blobs) == chunks, cls.__name__
