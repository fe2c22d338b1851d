"""Shared differential round-trip suite — the AbstractTestCompression analogue
(reference: AbstractTestCompression.java:39-703).

Concrete test classes provide the unit under test plus an independent oracle;
the suite checks round-trips, format conformance (oracle decodes our bytes),
bit-exact decode of oracle bytes, buffer-type quadrants, output canaries,
prefix sweeps, and statelessness.
"""

from __future__ import annotations

import numpy as np
import pytest

from aircompressor_tpu.errors import MalformedInputException


class CodecSuite:
    # Override in subclasses -------------------------------------------------
    def make_compressor(self):
        raise NotImplementedError

    def make_decompressor(self):
        raise NotImplementedError

    def oracle_compress(self, data: bytes) -> bytes:
        raise NotImplementedError("no oracle")

    def oracle_decompress(self, comp: bytes, orig_len: int) -> bytes:
        raise NotImplementedError("no oracle")

    def has_oracle(self) -> bool:
        return False

    # max input size for slow reference tiers (tests trim corpus data)
    max_len = 150_000

    # allowed corpus-aggregate size ratio vs the oracle compressor
    oracle_size_slack = 1.03

    # ------------------------------------------------------------------ cases
    def _cases(self, synthetic, corpus):
        for name, data in synthetic + corpus:
            yield name, data[: self.max_len]

    # ------------------------------------------------------------------ tests
    def test_round_trip(self, synthetic, corpus):
        c = self.make_compressor()
        d = self.make_decompressor()
        for name, data in self._cases(synthetic, corpus):
            comp = c.compress(data)
            out = d.decompress(comp, len(data))
            assert out == data, f"round trip failed for {name}"

    def test_oracle_decodes_ours(self, synthetic, corpus):
        if not self.has_oracle():
            pytest.skip("oracle unavailable")
        c = self.make_compressor()
        for name, data in self._cases(synthetic, corpus):
            comp = c.compress(data)
            assert self.oracle_decompress(comp, len(data)) == data, (
                f"oracle cannot decode our output for {name}"
            )

    def test_we_decode_oracle(self, synthetic, corpus):
        if not self.has_oracle():
            pytest.skip("oracle unavailable")
        d = self.make_decompressor()
        for name, data in self._cases(synthetic, corpus):
            oc = self.oracle_compress(data)
            assert d.decompress(oc, len(data)) == data, (
                f"we cannot decode oracle output for {name}"
            )

    def test_compressed_size_at_most_oracle(self, corpus):
        if not self.has_oracle():
            pytest.skip("oracle unavailable")
        c = self.make_compressor()
        total_ours = total_oracle = 0
        for name, data in corpus:
            data = data[: self.max_len]
            total_ours += len(c.compress(data))
            total_oracle += len(self.oracle_compress(data))
        # corpus-aggregate ratio must be at-or-below oracle + small slack
        assert total_ours <= total_oracle * self.oracle_size_slack, (
            total_ours, total_oracle,
        )

    def test_small_prefixes(self):
        # all prefixes 0..255 of mixed content
        # (reference: testRoundTripSmallLiteral, AbstractTestCompression.java:617-648)
        base = bytes(range(256)) + b"abcabcabc" * 30
        c = self.make_compressor()
        d = self.make_decompressor()
        for n in range(256):
            data = base[:n]
            assert d.decompress(c.compress(data), n) == data, f"prefix {n}"

    def test_output_canary(self, synthetic):
        # compressed output must not write past the reported length
        # (reference: buffer-overrun canary, AbstractTestCompression.java:101-163)
        c = self.make_compressor()
        rng = np.random.default_rng(7)
        for name, data in synthetic[:6]:
            cap = c.max_compressed_length(len(data))
            pad = 64
            buf = rng.integers(0, 256, cap + pad, dtype=np.uint8)
            canary = buf[cap:].copy()
            n = c.compress_into(np.frombuffer(data, dtype=np.uint8), buf[:cap])
            assert n <= cap
            assert np.array_equal(buf[cap:], canary), f"canary overwritten for {name}"

    def test_buffer_quadrants(self):
        # bytes / bytearray / memoryview / numpy inputs all accepted
        # (analogue of the reference's MemorySegment heap/direct quadrants)
        data = b"compressible compressible compressible!" * 20
        c = self.make_compressor()
        d = self.make_decompressor()
        outs = set()
        for view in (data, bytearray(data), memoryview(data), np.frombuffer(data, np.uint8)):
            outs.add(bytes(c.compress(view)))
        assert len(outs) == 1
        comp = outs.pop()
        for view in (comp, bytearray(comp), memoryview(comp), np.frombuffer(comp, np.uint8)):
            assert d.decompress(view, len(data)) == data

    def test_statelessness(self):
        # compressing different data first must not leak state
        # (reference: AbstractTestCompression.java:377-381)
        c = self.make_compressor()
        data = b"the quick brown fox " * 100
        first = c.compress(b"unrelated junk " * 57)
        again = c.compress(data)
        fresh = self.make_compressor().compress(data)
        assert bytes(again) == bytes(fresh)

    def malformed_cases(self) -> list[bytes]:
        """Inputs that MUST raise MalformedInputException. Override per codec."""
        return []

    def test_malformed_raises(self):
        cases = self.malformed_cases()
        if not cases:
            pytest.skip("no malformed cases declared")
        d = self.make_decompressor()
        for i, bad in enumerate(cases):
            with pytest.raises(MalformedInputException):
                d.decompress(bad, 1 << 16)
                pytest.fail(f"malformed case {i} decoded without error")
