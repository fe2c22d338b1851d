"""Zstd bitstream readers/writers.

Zstd uses two bitstream styles (RFC 8878 §4.1):
- the *backward* bitstream: written LSB-first, read starting from the END
  after locating the end-mark bit (highest set bit of the last byte). Used by
  FSE-coded streams, Huffman literal streams, and the sequences section.
  (Reference behavior: zstd/BitInputStream.java Initializer/Loader.)
- the *forward* little-endian bitstream used only by FSE table descriptions
  (normalized counts).

Our reader addresses bits positionally over the byte buffer (O(1) per read,
no big-int shifting), tolerating bounded over-read with zero-fill below the
stream start — matching the semantics decoders rely on for final-state reads.
"""

from __future__ import annotations

import numpy as np

from ..errors import MalformedInputException


class BackwardBitReader:
    """Reads bits MSB-down from a [start, end) byte range of ``buf``."""

    __slots__ = ("buf", "start", "remaining")

    def __init__(self, buf, start: int, end: int):
        # accept numpy or bytes; bytes is much faster for random scalar access
        self.buf = buf.tobytes() if isinstance(buf, np.ndarray) else bytes(buf)
        if end <= start or end > len(self.buf):
            raise MalformedInputException(start, "empty or invalid bitstream")
        self.start = start
        last = self.buf[end - 1]
        if last == 0:
            raise MalformedInputException(end - 1, "bitstream end mark missing")
        # bits below the end-mark bit are payload
        self.remaining = (end - start - 1) * 8 + (last.bit_length() - 1)

    def peek(self, n: int) -> int:
        """Top n bits (zero-padded at the bottom on over-read)."""
        if n == 0:
            return 0
        r = self.remaining
        if r <= 0:
            return 0
        if r < n:
            return self._extract(0, r) << (n - r)
        return self._extract(r - n, n)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.remaining -= n
        return v

    def skip(self, n: int) -> None:
        self.remaining -= n

    def is_overflowed(self) -> bool:
        return self.remaining < 0

    def is_fully_consumed(self) -> bool:
        return self.remaining == 0

    def _extract(self, lo_bit: int, n: int) -> int:
        lo = self.start + (lo_bit >> 3)
        hi = self.start + ((lo_bit + n + 7) >> 3)
        word = int.from_bytes(self.buf[lo:hi], "little")
        return (word >> (lo_bit & 7)) & ((1 << n) - 1)


class ForwardBitReader:
    """Forward little-endian bit reader (FSE normalized-count descriptions)."""

    __slots__ = ("buf", "base", "bit_pos", "limit_bits")

    def __init__(self, buf, start: int, end: int):
        self.buf = buf.tobytes() if isinstance(buf, np.ndarray) else bytes(buf)
        self.base = start
        self.bit_pos = 0
        self.limit_bits = (end - start) * 8

    def peek(self, n: int) -> int:
        lo = self.base + (self.bit_pos >> 3)
        hi = min(self.base + ((self.bit_pos + n + 7) >> 3), len(self.buf))
        word = int.from_bytes(self.buf[lo:hi], "little")
        return (word >> (self.bit_pos & 7)) & ((1 << n) - 1)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.bit_pos += n
        return v

    def skip(self, n: int) -> None:
        self.bit_pos += n

    def bytes_consumed(self) -> int:
        return (self.bit_pos + 7) >> 3

    def overflowed(self) -> bool:
        return self.bit_pos > self.limit_bits


class BackwardBitWriter:
    """Writes a backward bitstream: bits appended LSB-first, closed with the
    end-mark bit (reference behavior: zstd/BitOutputStream.java:49-89)."""

    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def add(self, value: int, n: int) -> None:
        if n:
            self.acc |= (value & ((1 << n) - 1)) << self.nbits
            self.nbits += n
            while self.nbits >= 8:
                self.out.append(self.acc & 0xFF)
                self.acc >>= 8
                self.nbits -= 8

    def close(self) -> bytes:
        # end mark
        self.acc |= 1 << self.nbits
        self.nbits += 1
        while self.nbits > 0:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8
        return bytes(self.out)
