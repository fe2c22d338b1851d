"""LZ4 codec family (reference: lz4/ package).

Tiers:
- ``Lz4RefCompressor/Lz4RefDecompressor`` — numpy reference tier (analogue of
  Lz4JavaCompressor/Lz4JavaDecompressor).
- ``Lz4NativeCompressor/Lz4NativeDecompressor`` — C++ host tier (analogue of
  the reference's FFM bindings to liblz4).
- TPU tier lives in aircompressor_tpu.ops / models (chunk-parallel).

``Lz4Compressor.create()`` / ``Lz4Decompressor.create()`` pick the fastest
available tier (reference: lz4/Lz4Compressor.java:22-31 native-first factory).
"""

from __future__ import annotations

import numpy as np

from ..api import BufferLike, Compressor, Decompressor, as_u8, as_writable_u8
from . import block_ref, constants


class Lz4Compressor(Compressor):
    @staticmethod
    def create(acceleration: int = 1) -> "Lz4Compressor":
        from .. import native

        if native.is_enabled():
            return Lz4NativeCompressor(acceleration)
        return Lz4RefCompressor(acceleration)

    def max_compressed_length(self, uncompressed_size: int) -> int:
        return constants.max_compressed_length(uncompressed_size)


class Lz4Decompressor(Decompressor):
    @staticmethod
    def create() -> "Lz4Decompressor":
        from .. import native

        if native.is_enabled():
            return Lz4NativeDecompressor()
        return Lz4RefDecompressor()


class Lz4RefCompressor(Lz4Compressor):
    def __init__(self, acceleration: int = 1):
        if not 1 <= acceleration <= 65537:
            raise ValueError(f"acceleration must be in [1, 65537]: {acceleration}")
        self.acceleration = acceleration

    def compress_into(self, src: BufferLike, dst: BufferLike) -> int:
        s = as_u8(src)
        d = as_writable_u8(dst)
        if d.size < self.max_compressed_length(s.size):
            raise ValueError("output buffer smaller than max_compressed_length")
        return block_ref.compress(s, d, self.acceleration)


class Lz4RefDecompressor(Lz4Decompressor):
    def decompress_into(self, src: BufferLike, dst: BufferLike) -> int:
        return block_ref.decompress(as_u8(src), as_writable_u8(dst))


class Lz4NativeCompressor(Lz4Compressor):
    def __init__(self, acceleration: int = 1):
        from .. import native

        native.verify_enabled()
        if not 1 <= acceleration <= 65537:
            raise ValueError(f"acceleration must be in [1, 65537]: {acceleration}")
        self.acceleration = acceleration

    def compress_into(self, src: BufferLike, dst: BufferLike) -> int:
        from .. import native

        s = as_u8(src)
        d = as_writable_u8(dst)
        if d.size < self.max_compressed_length(s.size):
            raise ValueError("output buffer smaller than max_compressed_length")
        return native.lz4_compress(s, d, self.acceleration)


class Lz4NativeDecompressor(Lz4Decompressor):
    def __init__(self):
        from .. import native

        native.verify_enabled()

    def decompress_into(self, src: BufferLike, dst: BufferLike) -> int:
        from .. import native

        return native.lz4_decompress(as_u8(src), as_writable_u8(dst))


__all__ = [
    "Lz4Compressor",
    "Lz4Decompressor",
    "Lz4RefCompressor",
    "Lz4RefDecompressor",
    "Lz4NativeCompressor",
    "Lz4NativeDecompressor",
    "constants",
    "block_ref",
]
