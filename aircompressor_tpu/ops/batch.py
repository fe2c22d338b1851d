"""Public batch-codec API over the TPU kernels.

The TPU tier's natural unit of work is a BATCH of independent chunks; this
module is the user-facing surface for it, handling padding, shape bucketing
(jit caches per shape), malformed-input surfacing, and the optional
multi-chip mesh path. Host tiers expose one-shot ``compress``/``decompress``
(reference: Compressor.java); the TPU tier adds the batched equivalents the
reference delegates to its callers (SURVEY.md §2.9 — thread-parallelism is
the caller's job in the reference; here the device IS the parallelism).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..errors import MalformedInputException

CHUNK = 65536
_COMP_ALIGN = 1024
# Blobs above this decode on the HOST tier: the decode megakernels' VMEM
# geometry scales with the batch's max compressed length, and
# incompressible ~64KB chunks (blob >= input, e.g. jpg/pdf content) push
# the unified [input|output] window past the scoped-vmem budget (caught
# by the r5 full-corpus soak, scratch/soak_full_corpus.py). The framed
# formats never produce such blobs (they STORE incompressible chunks),
# but the batch API accepts arbitrary block-codec output.
_KERNEL_COMP_CAP = 45056


def _host_decode_oversized(blobs, res, decomp, max_chunk):
    """Decode blobs over _KERNEL_COMP_CAP on the host tier into res;
    returns the indices left for the kernel path."""
    small = []
    for i, b in enumerate(blobs):
        if len(b) <= _KERNEL_COMP_CAP:
            small.append(i)
            continue
        try:
            res[i] = bytes(decomp.decompress(b, max_chunk))
        except MalformedInputException as e:
            raise MalformedInputException(i, e.reason) from e
    return small


_KERNEL_OK: dict = {}  # codec -> megakernel passed its one-time canary


def _selfcheck_payload(seed: int = 0xA1C0) -> bytes:
    """Production-size (64KB) MIXED canary payload: repeated text at
    varied distances + an incompressible stretch. The r4 lesson (VERDICT
    #7): a small repetitive canary green-lit a kernel that corrupted real
    corpus chunks — every self-check that gates a production path uses
    this instead. The text portion is capped so the random stretch always
    survives (a plain [:65536] truncation would cut it off entirely)."""
    rng = np.random.default_rng(seed)
    words = [rng.integers(32, 127, int(n), dtype=np.uint8)
             for n in rng.integers(5, 400, 60)]
    parts: list = []
    total = 0
    for i in rng.integers(0, len(words), 400):
        w = words[int(i)]
        if total + w.size > 65536 - 8192:
            break
        parts.append(w)
        total += w.size
    parts.append(rng.integers(0, 256, 8192, dtype=np.uint8))
    return np.concatenate(parts).tobytes()[:65536]


def _kernel_self_check(codec: str, dec, compress) -> bool:
    """One-time per-process canary decode of a known chunk through the
    Pallas megakernel (graceful-fallback contract of the native loader,
    internal/NativeLoader.java:104-112: a lowering regression degrades to
    the multi-fusion XLA tier instead of corrupting output)."""
    ok = _KERNEL_OK.get(codec)
    if ok is None:
        import jax.numpy as jnp

        try:
            payload = _selfcheck_payload()
            blob = compress(payload)
            buf, lens = _pack([blob], _round_up(len(blob) + 1, _COMP_ALIGN))
            out, olens, okv = dec(jnp.asarray(buf), jnp.asarray(lens))
            ok = bool(np.asarray(okv)[0]) and (
                np.asarray(out)[0, : int(np.asarray(olens)[0])].tobytes()
                == payload)
        except Exception:  # noqa: BLE001
            ok = False
        _KERNEL_OK[codec] = ok
    return ok


def _snappy_decode():
    """Snappy device decode: the single-launch Pallas megakernel on TPU
    (one program per batch — the device analogue of the reference's one
    JNI call, Lz4Native.java:30-41); the multi-fusion XLA decoder off-TPU
    (Pallas interpret mode is Python-speed, XLA-CPU is not) and as the
    self-check fallback."""
    import jax

    from . import snappy_jax

    if jax.default_backend() == "tpu":
        from . import snappy_pallas_w
        from ..snappy import SnappyCompressor

        if _kernel_self_check("snappy", snappy_pallas_w.decode,
                              SnappyCompressor.create().compress):
            return snappy_pallas_w.decode
    return snappy_jax.decode


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pack(blobs: Sequence[bytes], cap: int):
    B = len(blobs)
    buf = np.zeros((B, cap), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, b in enumerate(blobs):
        if len(b) > cap:
            raise ValueError(f"chunk {i} exceeds capacity {cap}")
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return buf, lens


def _steps_order(blobs: Sequence[bytes]) -> np.ndarray:
    """Decode order that groups chunks with similar token counts.

    The megakernels decode SUB chunks per grid step in lockstep, so each
    grid step costs the MAX loop-iteration count of its group. Compressed
    length is a good token-count proxy; sorting by it packs stragglers
    together instead of letting one slow chunk stall 31 fast ones."""
    return np.argsort(np.asarray([len(b) for b in blobs]), kind="stable")


class SnappyBatchCodec:
    """Chunk-parallel Snappy over the device (ops/snappy_jax + encode)."""

    def __init__(self, max_chunk: int = CHUNK):
        if max_chunk > CHUNK:
            raise ValueError("snappy batch chunks are capped at 64KB")
        self.max_chunk = max_chunk

    def compress_chunks(self, chunks: Sequence[bytes]) -> list[bytes]:
        import jax
        import jax.numpy as jnp

        from . import snappy_encode_jax

        if not chunks:
            return []
        buf, lens = _pack(chunks, self.max_chunk)
        if jax.default_backend() == "tpu" and self._encode_kernel_ok():
            from . import snappy_encode_pallas

            comp, clens, ok = snappy_encode_pallas.encode(
                jnp.asarray(buf), jnp.asarray(lens))
            ok = np.asarray(ok)
            comp = np.asarray(comp)
            clens = np.asarray(clens)
            if ok.all():
                return [comp[i, : clens[i]].tobytes()
                        for i in range(len(chunks))]
            # overflow chunks (cap exceeded): fall through to the XLA path
        comp, clens = snappy_encode_jax.encode(jnp.asarray(buf), jnp.asarray(lens))
        comp = np.asarray(comp)
        clens = np.asarray(clens)
        return [comp[i, : clens[i]].tobytes() for i in range(len(chunks))]

    @staticmethod
    def _encode_kernel_ok() -> bool:
        """One-time canary: kernel output must round-trip through the ref
        decoder (same gating contract as the decode megakernels)."""
        ok = _KERNEL_OK.get("snappy_enc")
        if ok is None:
            import jax.numpy as jnp

            try:
                from ..snappy import SnappyRefDecompressor
                from . import snappy_encode_pallas

                payload = _selfcheck_payload()
                buf = np.zeros((1, 65536), np.uint8)
                buf[0, : len(payload)] = np.frombuffer(payload, np.uint8)
                comp, clens, okv = snappy_encode_pallas.encode(
                    jnp.asarray(buf),
                    jnp.asarray(np.array([len(payload)], np.int32)))
                blob = np.asarray(comp)[0, : int(np.asarray(clens)[0])].tobytes()
                ok = bool(np.asarray(okv)[0]) and bytes(
                    SnappyRefDecompressor().decompress(
                        blob, len(payload))) == payload
            except Exception:  # noqa: BLE001
                ok = False
            _KERNEL_OK["snappy_enc"] = ok
        return ok

    def decompress_chunks(self, blobs: Sequence[bytes]) -> list[bytes]:
        import jax.numpy as jnp

        from ..snappy import SnappyDecompressor

        if not blobs:
            return []
        res: list = [None] * len(blobs)
        small = _host_decode_oversized(
            blobs, res, SnappyDecompressor.create(), self.max_chunk)
        if small:
            sb = [blobs[i] for i in small]
            order = _steps_order(sb)
            cap = _round_up(max(len(b) for b in sb) + 1, _COMP_ALIGN)
            buf, lens = _pack([sb[i] for i in order], cap)
            out, olens, ok = _snappy_decode()(
                jnp.asarray(buf), jnp.asarray(lens), out_cap=self.max_chunk
            )
            out = np.asarray(out)
            olens = np.asarray(olens)
            ok = np.asarray(ok)
            bad = np.nonzero(~ok)[0]
            if bad.size:
                raise MalformedInputException(
                    small[int(order[bad[0]])],
                    "malformed snappy chunk in batch")
            for row, i in enumerate(order):
                res[small[i]] = out[row, : olens[row]].tobytes()
        return res


class Lz4BatchCodec:
    """Chunk-parallel LZ4 block codec over the device (ops/lz4_jax +
    ops/lz4_encode_jax)."""

    def __init__(self, max_chunk: int = CHUNK):
        self.max_chunk = max_chunk

    def compress_chunks(self, chunks: Sequence[bytes]) -> list[bytes]:
        import jax
        import jax.numpy as jnp

        from . import lz4_encode_jax

        if not chunks:
            return []
        buf, lens = _pack(chunks, self.max_chunk)
        if jax.default_backend() == "tpu" and self._encode_kernel_ok():
            from . import lz4_encode_pallas

            comp, clens, ok = lz4_encode_pallas.encode(
                jnp.asarray(buf), jnp.asarray(lens))
            ok = np.asarray(ok)
            comp = np.asarray(comp)
            clens = np.asarray(clens)
            if ok.all():
                return [comp[i, : clens[i]].tobytes()
                        for i in range(len(chunks))]
        comp, clens = lz4_encode_jax.encode(jnp.asarray(buf), jnp.asarray(lens))
        comp = np.asarray(comp)
        clens = np.asarray(clens)
        return [comp[i, : clens[i]].tobytes() for i in range(len(chunks))]

    @staticmethod
    def _encode_kernel_ok() -> bool:
        """One-time canary round-trip through the ref decoder."""
        ok = _KERNEL_OK.get("lz4_enc")
        if ok is None:
            import jax.numpy as jnp

            try:
                from ..lz4 import Lz4RefDecompressor
                from . import lz4_encode_pallas

                payload = _selfcheck_payload()
                buf = np.zeros((1, 65536), np.uint8)
                buf[0, : len(payload)] = np.frombuffer(payload, np.uint8)
                comp, clens, okv = lz4_encode_pallas.encode(
                    jnp.asarray(buf),
                    jnp.asarray(np.array([len(payload)], np.int32)))
                blob = np.asarray(comp)[0, : int(np.asarray(clens)[0])].tobytes()
                ok = bool(np.asarray(okv)[0]) and bytes(
                    Lz4RefDecompressor().decompress(
                        blob, len(payload))) == payload
            except Exception:  # noqa: BLE001
                ok = False
            _KERNEL_OK["lz4_enc"] = ok
        return ok

    def decompress_chunks(self, blobs: Sequence[bytes]) -> list[bytes]:
        import jax
        import jax.numpy as jnp

        from . import lz4_jax as _lz4_xla

        lz4_jax = _lz4_xla
        if jax.default_backend() == "tpu":
            from . import lz4_pallas_w
            from ..lz4 import Lz4Compressor

            if _kernel_self_check("lz4", lz4_pallas_w.decode,
                                  Lz4Compressor.create().compress):
                lz4_jax = lz4_pallas_w  # single-launch megakernel

        if not blobs:
            return []
        from ..lz4 import Lz4Decompressor

        res: list = [None] * len(blobs)
        small = _host_decode_oversized(
            blobs, res, Lz4Decompressor.create(), self.max_chunk)
        if small:
            sb = [blobs[i] for i in small]
            order = _steps_order(sb)
            cap = _round_up(max(len(b) for b in sb) + 1, _COMP_ALIGN)
            buf, lens = _pack([sb[i] for i in order], cap)
            out, olens, ok = lz4_jax.decode(
                jnp.asarray(buf), jnp.asarray(lens), out_cap=self.max_chunk
            )
            out = np.asarray(out)
            olens = np.asarray(olens)
            ok = np.asarray(ok)
            bad = np.nonzero(~ok)[0]
            if bad.size:
                raise MalformedInputException(
                    small[int(order[bad[0]])], "malformed lz4 chunk in batch")
            for row, i in enumerate(order):
                res[small[i]] = out[row, : olens[row]].tobytes()
        return res


class LzoBatchCodec:
    """Chunk-parallel LZO1X decode on the device (single-launch Pallas
    megakernel, ops/lzo_pallas_w). Compression uses the host tier per chunk —
    the reference has no native LZO either (its LZO is Java-only), so the
    encode side is host-tier by the same parity argument."""

    def __init__(self, max_chunk: int = CHUNK):
        if max_chunk > CHUNK:
            raise ValueError("lzo batch chunks are capped at 64KB")
        self.max_chunk = max_chunk

    def compress_chunks(self, chunks: Sequence[bytes]) -> list[bytes]:
        from ..lzo import LzoCompressor

        comp = LzoCompressor.create()
        return [bytes(comp.compress(c)) for c in chunks]

    def decompress_chunks(self, blobs: Sequence[bytes]) -> list[bytes]:
        import jax
        import jax.numpy as jnp

        from ..lzo import LzoCompressor, LzoDecompressor

        use_kernel = False
        if jax.default_backend() == "tpu":
            from . import lzo_pallas_w

            use_kernel = _kernel_self_check(
                "lzo", lzo_pallas_w.decode, LzoCompressor.create().compress)
        if not blobs:
            return []
        if not use_kernel:
            # off-TPU (Pallas interpret mode is Python-speed) or failed
            # self-check: host tier
            d = LzoDecompressor.create()
            return [bytes(d.decompress(b, self.max_chunk)) for b in blobs]
        from . import lzo_pallas_w

        res: list = [None] * len(blobs)
        small = _host_decode_oversized(
            blobs, res, LzoDecompressor.create(), self.max_chunk)
        if not small:
            return res
        sb = [blobs[i] for i in small]
        order = _steps_order(sb)
        cap = _round_up(max(len(b) for b in sb) + 1, _COMP_ALIGN)
        buf, lens = _pack([sb[i] for i in order], cap)
        out, olens, ok = lzo_pallas_w.decode(
            jnp.asarray(buf), jnp.asarray(lens), out_cap=self.max_chunk)
        out = np.asarray(out)
        olens = np.asarray(olens)
        ok = np.asarray(ok)
        bad = np.nonzero(~ok)[0]
        if bad.size:
            raise MalformedInputException(
                small[int(order[bad[0]])], "malformed lzo chunk in batch")
        for row, i in enumerate(order):
            res[small[i]] = out[row, : olens[row]].tobytes()
        return res


class DeflateBatchCodec:
    """Chunk-parallel raw-deflate decode on the device (single-launch
    Pallas megakernel, ops/deflate_pallas_w) — the TPU analogue of the
    reference's libdeflate binding (deflate/DeflateNative.java:28-40).
    Planning (block boundaries + Huffman LUT pages) runs in the native
    C++ planner (native/src/inflate.cc); the kernel re-derives every
    output byte from the raw bitstream. Compression uses the host tier
    per chunk. Chunks the planner cannot map to the kernel's static
    geometry (>16 blocks, oversized table pages, oversized blobs) decode
    on the host tier; malformed streams surface the host tier's
    exception contract."""

    def __init__(self, max_chunk: int = CHUNK, level: int = 6):
        if max_chunk > CHUNK:
            raise ValueError("deflate batch chunks are capped at 64KB")
        self.max_chunk = max_chunk
        self.level = level

    def compress_chunks(self, chunks: Sequence[bytes]) -> list[bytes]:
        from ..deflate import DeflateCompressor, max_compressed_length

        comp = DeflateCompressor.create(self.level)
        out = []
        for c in chunks:
            dst = np.zeros(max_compressed_length(len(c)), np.uint8)
            n = comp.compress_into(np.frombuffer(c, np.uint8), dst)
            out.append(dst[:n].tobytes())
        return out

    @staticmethod
    def _kernel_ok() -> bool:
        ok = _KERNEL_OK.get("deflate")
        if ok is None:
            import jax.numpy as jnp
            import zlib

            try:
                from ..deflate import device_prep
                from . import deflate_pallas_w

                payload = _selfcheck_payload()
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                blob = co.compress(payload) + co.flush()
                buf, lens = _pack([blob], _round_up(len(blob) + 1, _COMP_ALIGN))
                desc, tabs, info = device_prep.plan_batch(buf, lens)
                pages, _ = device_prep.pack_pages(desc, tabs, info)
                ok = bool(info[0, 3] == device_prep.ST_OK)
                if ok:
                    out, olens, okv = deflate_pallas_w.decode(
                        jnp.asarray(buf), jnp.asarray(lens), pages)
                    ok = bool(np.asarray(okv)[0]) and (
                        np.asarray(out)[0, : int(np.asarray(olens)[0])]
                        .tobytes() == payload)
            except Exception:  # noqa: BLE001
                ok = False
            _KERNEL_OK["deflate"] = ok
        return ok

    def decompress_chunks(self, blobs: Sequence[bytes]) -> list[bytes]:
        import jax

        from ..deflate import DeflateDecompressor

        if not blobs:
            return []
        use_kernel = (jax.default_backend() == "tpu"
                      and self._kernel_ok())
        d = DeflateDecompressor.create()

        def host_one(i: int, b: bytes) -> bytes:
            dst = np.zeros(self.max_chunk, np.uint8)
            try:
                n = d.decompress_into(np.frombuffer(b, np.uint8), dst)
            except MalformedInputException as e:
                raise MalformedInputException(i, e.reason) from e
            return dst[:n].tobytes()

        if not use_kernel:
            return [host_one(i, b) for i, b in enumerate(blobs)]

        import jax.numpy as jnp

        from ..deflate import device_prep
        from . import deflate_pallas_w

        res: list = [None] * len(blobs)
        small = [i for i, b in enumerate(blobs)
                 if len(b) <= _KERNEL_COMP_CAP]
        for i, b in enumerate(blobs):
            if len(b) > _KERNEL_COMP_CAP:
                res[i] = host_one(i, b)
        if small:
            sb = [blobs[i] for i in small]
            order = _steps_order(sb)
            cap = _round_up(max(len(b) for b in sb) + 1, _COMP_ALIGN)
            buf, lens = _pack([sb[i] for i in order], cap)
            desc, tabs, info = device_prep.plan_batch(buf, lens)
            elig = info[:, 3] == device_prep.ST_OK
            pages, _ = device_prep.pack_pages(desc, tabs, info)
            out, olens, ok = deflate_pallas_w.decode(
                jnp.asarray(buf), jnp.asarray(lens), pages,
                out_cap=self.max_chunk)
            out = np.asarray(out)
            olens = np.asarray(olens)
            ok = np.asarray(ok)
            for row, i in enumerate(order):
                if not elig[row]:
                    # planner fallback OR malformed: host tier decides
                    # (raises the exception contract for malformed)
                    res[small[i]] = host_one(small[i], sb[i])
                    continue
                if not ok[row] or olens[row] != info[row, 0]:
                    raise MalformedInputException(
                        small[int(i)], "malformed deflate chunk in batch")
                res[small[i]] = out[row, : olens[row]].tobytes()
        return res


class ZstdBatchCodec:
    """Frame-parallel Zstd on the device. Decode: three single-launch Pallas
    kernels (Huffman literals, FSE sequences, sequence execution —
    ops/zstd_jax + ops/zstd_pallas; host parses only headers). Encode: the
    entropy hot loops (4-stream Huffman emission + interleaved reverse FSE
    walk + backward bit packing) run as one batched device program per
    launch (ops/zstd_encode_jax); match finding runs on device when the
    Pallas DFAST matcher's proposals pass host-side content verification,
    else on host (table builds always host-side; VERDICT r2 #6,
    entropy-first). With the device matcher off the output is
    bit-identical to the host tier; with it on, frames remain decodable
    and size-competitive (every match host-verified, every frame carries
    the xxh64 checksum). The encode tier is gated by a one-time per-level
    self-check on a production-size (64KB) mixed payload and degrades to
    the host tier (reference contract,
    internal/NativeLoader.java:104-112)."""

    def __init__(self, max_chunk: int | None = None, level: int = 3):
        from . import zstd_jax

        self.max_chunk = max_chunk or zstd_jax.OUT_CAP
        if self.max_chunk > zstd_jax.OUT_CAP:
            raise ValueError(
                f"zstd device chunks are capped at {zstd_jax.OUT_CAP} bytes")
        self.level = level

    def _encode_self_check(self) -> bool:
        key = f"zstd_encode:{self.level}"
        ok = _KERNEL_OK.get(key)
        if ok is None:
            try:
                from ..zstd import frame_dec
                from . import zstd_encode_jax

                payloads = [
                    _selfcheck_payload(),
                    bytes(np.tile(np.frombuffer(
                        b"zstd device encode self check 0123456789",
                        np.uint8), 40)),
                ]
                frames = zstd_encode_jax.compress_batch(
                    payloads, self.level)
                ok = True
                for payload, frame in zip(payloads, frames):
                    src = np.frombuffer(frame, np.uint8)
                    dst = np.zeros(len(payload) + 16, np.uint8)
                    n = frame_dec.decompress(src, dst)
                    ok = ok and dst[:n].tobytes() == payload
            except Exception:  # noqa: BLE001
                ok = False
            _KERNEL_OK[key] = ok
        return ok

    def compress_chunks(self, chunks: Sequence[bytes]) -> list[bytes]:
        if chunks and self._encode_self_check():
            from . import zstd_encode_jax

            return zstd_encode_jax.compress_batch(list(chunks), self.level)
        from ..zstd import ZstdCompressor

        comp = ZstdCompressor.create(self.level)
        return [comp.compress(c) for c in chunks]

    def decompress_chunks(self, blobs: Sequence[bytes]) -> list[bytes]:
        from . import zstd_jax

        return zstd_jax.decode_batch(blobs, out_cap=self.max_chunk)


def snappy_framed_decompress_device(data: bytes, verify_checksums: bool = True) -> bytes:
    """Decode an x-snappy-framed stream with the compressed chunks decoded
    as ONE device batch and all chunk CRCs verified by the batched device
    CRC32C kernel (the framing walk is host-side and cheap; the chunk
    payloads are the heavy part — reference: SnappyFramedInputStream)."""
    import jax.numpy as jnp

    from ..snappy.framed import iter_frames
    from . import checksum_jax

    comp_chunks: list[bytes] = []
    comp_crcs: list[int] = []
    parts: list[bytes | None] = []
    plain: list[tuple[bytes, int]] = []
    for kind, payload, crc in iter_frames(data):
        if kind == "compressed":
            comp_chunks.append(payload)
            comp_crcs.append(crc)
            parts.append(None)
        else:
            plain.append((payload, crc))
            parts.append(payload)
    decoded: list[bytes] = []
    if comp_chunks:
        cap = _round_up(max(len(b) for b in comp_chunks) + 1, _COMP_ALIGN)
        buf, lens = _pack(comp_chunks, cap)
        out, olens, ok = _snappy_decode()(
            jnp.asarray(buf), jnp.asarray(lens), out_cap=CHUNK
        )
        okn = np.asarray(ok)
        if not okn.all():
            raise MalformedInputException(
                int(np.nonzero(~okn)[0][0]), "malformed snappy framed chunk")
        if verify_checksums:
            crcs = checksum_jax.mask_crc(checksum_jax.crc32c(out, olens))
            got = np.asarray(crcs)
            if not np.array_equal(got, np.asarray(comp_crcs, dtype=np.uint32)):
                bad = int(np.nonzero(got != np.asarray(comp_crcs, np.uint32))[0][0])
                raise MalformedInputException(bad, "chunk checksum mismatch")
        outn = np.asarray(out)
        olensn = np.asarray(olens)
        decoded = [outn[i, : olensn[i]].tobytes() for i in range(len(comp_chunks))]
    if verify_checksums:
        from ..crc import crc32c_raw, mask_crc

        for payload, crc in plain:
            if mask_crc(crc32c_raw(payload)) != crc:
                raise MalformedInputException(0, "uncompressed chunk checksum mismatch")
    it = iter(decoded)
    return b"".join(p if p is not None else next(it) for p in parts)
