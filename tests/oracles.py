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


# ---------------------------------------------------------------- LZO block
LZO_DIR = "/root/reference/src/test/resources/nativelib/Linux-amd64"


def lzo_lib():
    """Upstream liblzo2 (shipped by the reference for its Hadoop-compat
    tests, HadoopNative.java:33-54)."""
    if "liblzo2" in _cache:
        return _cache["liblzo2"]
    lib = None
    path = os.path.join(LZO_DIR, "liblzo2.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path, mode=os.RTLD_LAZY)
            lib.lzo1x_1_compress.restype = ctypes.c_int
            lib.lzo1x_decompress_safe.restype = ctypes.c_int
        except OSError:
            lib = None
    _cache["liblzo2"] = lib
    return lib


def lzo_compress(data: bytes) -> bytes:
    lib = lzo_lib()
    cap = len(data) + len(data) // 16 + 64 + 3
    out = ctypes.create_string_buffer(cap)
    out_len = ctypes.c_size_t(cap)
    wrk = ctypes.create_string_buffer(16384 * 8)  # LZO1X_1_MEM_COMPRESS
    r = lib.lzo1x_1_compress(data, ctypes.c_size_t(len(data)), out,
                             ctypes.byref(out_len), wrk)
    assert r == 0
    return out.raw[: out_len.value]


def lzo_decompress(comp: bytes, orig_len: int) -> bytes:
    lib = lzo_lib()
    out = ctypes.create_string_buffer(orig_len)
    out_len = ctypes.c_size_t(orig_len)
    r = lib.lzo1x_decompress_safe(comp, ctypes.c_size_t(len(comp)), out,
                                  ctypes.byref(out_len), None)
    if r != 0:
        raise ValueError(f"oracle lzo decode failed: {r}")
    return out.raw[: out_len.value]


# ---------------------------------------------------------------- LZ4 frame
# The shipped liblz4 was built against a bundled xxhash with LZ4_-prefixed
# symbols that were stripped from the final .so; the LZ4F_* frame API faults
# at call time on LZ4_XXH32_*. A tiny compiled shim forwards those four
# symbols to the shipped libxxhash, loaded RTLD_GLOBAL so the dynamic linker
# resolves liblz4's lazy relocations against it.
_LZ4F_SHIM_SRC = r"""
#include <stddef.h>
typedef unsigned XXH32_hash_t;
typedef struct XXH32_state_s XXH32_state_t;
typedef enum { XXH_OK = 0, XXH_ERROR } XXH_errorcode;
extern XXH32_hash_t XXH32(const void*, size_t, unsigned);
extern XXH_errorcode XXH32_reset(XXH32_state_t*, unsigned);
extern XXH_errorcode XXH32_update(XXH32_state_t*, const void*, size_t);
extern XXH32_hash_t XXH32_digest(const XXH32_state_t*);
XXH32_hash_t LZ4_XXH32(const void* p, size_t n, unsigned s) { return XXH32(p, n, s); }
XXH_errorcode LZ4_XXH32_reset(XXH32_state_t* st, unsigned s) { return XXH32_reset(st, s); }
XXH_errorcode LZ4_XXH32_update(XXH32_state_t* st, const void* p, size_t n) { return XXH32_update(st, p, n); }
XXH32_hash_t LZ4_XXH32_digest(const XXH32_state_t* st) { return XXH32_digest(st); }
"""


def lz4f_lib():
    """liblz4's LZ4F_* frame API, made callable via the xxhash shim."""
    if "lz4f" in _cache:
        return _cache["lz4f"]
    lib = None
    try:
        import subprocess
        import tempfile

        ctypes.CDLL(os.path.join(ORACLE_DIR, "libxxhash.so"),
                    mode=ctypes.RTLD_GLOBAL)
        shim = os.path.join(tempfile.gettempdir(), "lz4f_xxh_shim.so")
        if not os.path.exists(shim):
            with tempfile.NamedTemporaryFile(
                    "w", suffix=".c", delete=False) as f:
                f.write(_LZ4F_SHIM_SRC)
                src = f.name
            subprocess.run(
                ["gcc", "-shared", "-fPIC", "-o", shim, src,
                 "-L", ORACLE_DIR, "-lxxhash",
                 f"-Wl,-rpath,{ORACLE_DIR}"],
                check=True, capture_output=True)
        ctypes.CDLL(shim, mode=ctypes.RTLD_GLOBAL)
        lib = ctypes.CDLL(os.path.join(ORACLE_DIR, "liblz4.so"),
                          mode=ctypes.RTLD_GLOBAL)
        lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
        lib.LZ4F_compressFrame.restype = ctypes.c_size_t
        lib.LZ4F_isError.restype = ctypes.c_uint
        lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
        lib.LZ4F_decompress.restype = ctypes.c_size_t
        lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
        # smoke-test: a 12-byte frame round-trip (faults if the shim or the
        # state-layout assumption is wrong)
        probe = lz4f_compress_with(lib, b"probe-data!!")
        if lz4f_decompress_with(lib, probe, 12) != b"probe-data!!":
            lib = None
    except Exception:  # noqa: BLE001
        lib = None
    _cache["lz4f"] = lib
    return lib


class _LZ4FFrameInfo(ctypes.Structure):
    _fields_ = [("blockSizeID", ctypes.c_int),
                ("blockMode", ctypes.c_int),
                ("contentChecksumFlag", ctypes.c_int),
                ("frameType", ctypes.c_int),
                ("contentSize", ctypes.c_uint64),
                ("dictID", ctypes.c_uint32),
                ("blockChecksumFlag", ctypes.c_int)]


class _LZ4FPreferences(ctypes.Structure):
    _fields_ = [("frameInfo", _LZ4FFrameInfo),
                ("compressionLevel", ctypes.c_int),
                ("autoFlush", ctypes.c_uint),
                ("favorDecSpeed", ctypes.c_uint),
                ("reserved", ctypes.c_uint * 3)]


def _lz4f_prefs() -> _LZ4FPreferences:
    """Block-INDEPENDENT frames: LZ4F defaults to linked blocks, which this
    codec (like the reference, Lz4FrameCompression.java:213-220) rejects."""
    p = _LZ4FPreferences()
    ctypes.memset(ctypes.byref(p), 0, ctypes.sizeof(p))
    p.frameInfo.blockMode = 1  # LZ4F_blockIndependent
    p.frameInfo.contentChecksumFlag = 1
    return p


def lz4f_compress_with(lib, data: bytes) -> bytes:
    prefs = _lz4f_prefs()
    bound = lib.LZ4F_compressFrameBound(ctypes.c_size_t(len(data)),
                                        ctypes.byref(prefs))
    out = ctypes.create_string_buffer(bound)
    r = lib.LZ4F_compressFrame(out, ctypes.c_size_t(bound), data,
                               ctypes.c_size_t(len(data)),
                               ctypes.byref(prefs))
    assert not lib.LZ4F_isError(ctypes.c_size_t(r))
    return out.raw[:r]


def lz4f_decompress_with(lib, comp: bytes, orig_len: int) -> bytes:
    ctx = ctypes.c_void_p()
    r = lib.LZ4F_createDecompressionContext(ctypes.byref(ctx), 100)
    assert not lib.LZ4F_isError(ctypes.c_size_t(r))
    try:
        out = ctypes.create_string_buffer(orig_len + 64)
        dst_len = ctypes.c_size_t(len(out))
        src_len = ctypes.c_size_t(len(comp))
        r = lib.LZ4F_decompress(ctx, out, ctypes.byref(dst_len),
                                comp, ctypes.byref(src_len), None)
        if lib.LZ4F_isError(ctypes.c_size_t(r)) or r != 0:
            raise ValueError("oracle lz4 frame decode failed")
        return out.raw[: dst_len.value]
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)


def lz4f_compress(data: bytes) -> bytes:
    return lz4f_compress_with(lz4f_lib(), data)


def lz4f_decompress(comp: bytes, orig_len: int) -> bytes:
    return lz4f_decompress_with(lz4f_lib(), comp, orig_len)
