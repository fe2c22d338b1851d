"""xxHash32/64 + CRC32C tests vs upstream oracle and official vectors
(reference test analogue: xxhash/AbstractTestXxHash64.java, TestXxHash3.java)."""

import os

import numpy as np
import pytest

import oracles
from aircompressor_tpu.crc import Crc32C, crc32c_raw, mask_crc, masked_crc32c
from aircompressor_tpu.xxhash import XxHash32State, XxHash64State
from aircompressor_tpu.xxhash import _scalar as xs

LENGTHS = [0, 1, 3, 4, 7, 8, 15, 16, 17, 31, 32, 33, 63, 64, 100, 255, 1000, 4096, 65537]


def _data(n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


@pytest.mark.skipif(oracles.xxhash_lib() is None, reason="libxxhash oracle unavailable")
@pytest.mark.parametrize("n", LENGTHS)
@pytest.mark.parametrize("seed", [0, 0x9747B28C])
def test_xxh32_matches_oracle(n, seed):
    data = _data(n, n)
    assert xs.xxh32(data, seed) == oracles.xxh32(data, seed)


@pytest.mark.skipif(oracles.xxhash_lib() is None, reason="libxxhash oracle unavailable")
@pytest.mark.parametrize("n", LENGTHS)
@pytest.mark.parametrize("seed", [0, 0x9E3779B185EBCA87])
def test_xxh64_matches_oracle(n, seed):
    data = _data(n, n + 1)
    assert xs.xxh64(data, seed) == oracles.xxh64(data, seed)


@pytest.mark.skipif(oracles.xxhash_lib() is None, reason="libxxhash oracle unavailable")
def test_streaming_states_match_one_shot():
    data = _data(10000, 42)
    for chunk in (1, 7, 16, 33, 4096):
        st64 = XxHash64State(5)
        st32 = XxHash32State(5)
        for i in range(0, len(data), chunk):
            st64.update(data[i : i + chunk])
            st32.update(data[i : i + chunk])
        assert st64.digest() == oracles.xxh64(data, 5)
        assert st32.digest() == oracles.xxh32(data, 5)


def test_crc32c_vectors():
    # iSCSI test vectors (RFC 3720 / public known answers)
    assert crc32c_raw(b"") == 0
    assert crc32c_raw(b"123456789") == 0xE3069283
    assert crc32c_raw(bytes(32)) == 0x8A9136AA
    assert crc32c_raw(bytes([0xFF] * 32)) == 0x62A8AB43


def test_crc32c_incremental():
    data = _data(9000, 1)
    whole = crc32c_raw(data)
    st = Crc32C()
    for i in range(0, len(data), 777):
        st.update(data[i : i + 777])
    assert st.digest() == whole
    # two-step continuation
    c = crc32c_raw(data[:100])
    assert crc32c_raw(data[100:], c) == whole


def test_snappy_crc_mask():
    # framing-format mask: rot-right-15 + 0xa282ead8
    assert mask_crc(0) == 0xA282EAD8
    assert masked_crc32c(b"") == 0xA282EAD8


@pytest.mark.skipif(not os.path.isdir(oracles.ORACLE_DIR), reason="no oracle dir")
def test_native_hash_tier_if_built():
    from aircompressor_tpu import native

    if not native.is_enabled():
        pytest.skip(f"native tier not built: {native.load_error()}")
    data = _data(100000, 9)
    assert native.xxh32(data, 3) == xs.xxh32(data, 3)
    assert native.xxh64(data, 3) == xs.xxh64(data, 3)
    assert native.crc32c(data) == crc32c_raw(data)
