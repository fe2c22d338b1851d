"""Third-party oracles for differential testing.

Mirrors the reference's test strategy (SURVEY.md §4): every codec is checked
against an INDEPENDENT implementation — upstream C libraries loaded via
ctypes (the same pinned .so binaries the reference ships as resources),
plus the python `zstandard`/`zlib`/`bz2` modules. Tests degrade to skip when
an oracle is unavailable.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

ORACLE_DIR = "/root/reference/src/main/resources/aircompressor/linux-amd64"

_cache: dict[str, Optional[ctypes.CDLL]] = {}


def _load(name: str) -> Optional[ctypes.CDLL]:
    if name in _cache:
        return _cache[name]
    path = os.path.join(ORACLE_DIR, name)
    lib = None
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path, mode=os.RTLD_LAZY)
        except OSError:
            lib = None
    _cache[name] = lib
    return lib


# ---------------------------------------------------------------- LZ4 block
def lz4_lib():
    lib = _load("liblz4.so")
    if lib is not None:
        lib.LZ4_compress_default.restype = ctypes.c_int
        lib.LZ4_decompress_safe.restype = ctypes.c_int
    return lib


def lz4_compress(data: bytes) -> bytes:
    lib = lz4_lib()
    cap = len(data) + len(data) // 255 + 16
    out = ctypes.create_string_buffer(cap)
    r = lib.LZ4_compress_default(data, out, len(data), cap)
    assert r > 0
    return out.raw[:r]


def lz4_decompress(comp: bytes, orig_len: int) -> bytes:
    lib = lz4_lib()
    out = ctypes.create_string_buffer(orig_len + 16)
    r = lib.LZ4_decompress_safe(comp, out, len(comp), orig_len + 16)
    if r < 0:
        raise ValueError(f"oracle lz4 decode failed: {r}")
    return out.raw[:r]


# ---------------------------------------------------------------- Snappy
def snappy_lib():
    lib = _load("libsnappy.so")
    if lib is not None:
        lib.snappy_compress.restype = ctypes.c_int
        lib.snappy_uncompress.restype = ctypes.c_int
        lib.snappy_max_compressed_length.restype = ctypes.c_size_t
    return lib


def snappy_compress(data: bytes) -> bytes:
    lib = snappy_lib()
    cap = lib.snappy_max_compressed_length(ctypes.c_size_t(len(data)))
    out = ctypes.create_string_buffer(cap)
    out_len = ctypes.c_size_t(cap)
    r = lib.snappy_compress(data, ctypes.c_size_t(len(data)), out, ctypes.byref(out_len))
    assert r == 0
    return out.raw[: out_len.value]


def snappy_decompress(comp: bytes, orig_len: int) -> bytes:
    lib = snappy_lib()
    out = ctypes.create_string_buffer(orig_len + 16)
    out_len = ctypes.c_size_t(orig_len + 16)
    r = lib.snappy_uncompress(comp, ctypes.c_size_t(len(comp)), out, ctypes.byref(out_len))
    if r != 0:
        raise ValueError(f"oracle snappy decode failed: {r}")
    return out.raw[: out_len.value]


# ---------------------------------------------------------------- xxhash
def xxhash_lib():
    lib = _load("libxxhash.so")
    if lib is not None:
        lib.XXH32.restype = ctypes.c_uint32
        lib.XXH64.restype = ctypes.c_uint64
    return lib


def xxh32(data: bytes, seed: int = 0) -> int:
    return int(xxhash_lib().XXH32(data, ctypes.c_size_t(len(data)), ctypes.c_uint32(seed)))


def xxh64(data: bytes, seed: int = 0) -> int:
    return int(xxhash_lib().XXH64(data, ctypes.c_size_t(len(data)), ctypes.c_uint64(seed)))


# ---------------------------------------------------------------- zstd
def zstd_module():
    try:
        import zstandard

        return zstandard
    except ImportError:
        return None


def zstd_lib():
    lib = _load("libzstd.so")
    if lib is not None:
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_isError.restype = ctypes.c_uint
    return lib


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    lib = zstd_lib()
    cap = lib.ZSTD_compressBound(ctypes.c_size_t(len(data)))
    out = ctypes.create_string_buffer(cap)
    r = lib.ZSTD_compress(out, cap, data, ctypes.c_size_t(len(data)), ctypes.c_int(level))
    assert not lib.ZSTD_isError(ctypes.c_size_t(r))
    return out.raw[:r]


def zstd_decompress(comp: bytes, orig_len: int) -> bytes:
    lib = zstd_lib()
    out = ctypes.create_string_buffer(orig_len + 16)
    r = lib.ZSTD_decompress(out, orig_len + 16, comp, ctypes.c_size_t(len(comp)))
    if lib.ZSTD_isError(ctypes.c_size_t(r)):
        raise ValueError("oracle zstd decode failed")
    return out.raw[:r]
