"""Native (C++) kernel tier — loader and ctypes bindings.

Analogue of the reference's L1 native loader + FFM bindings
(reference: internal/NativeLoader.java:64-196, lz4/Lz4Native.java,
snappy/SnappyNative.java, xxhash/XxHash64Bindings.java): a host-side fast
tier behind the same interfaces as the pure-Python tier, selected by
``create()`` factories with graceful fallback when the shared library is not
built or fails to load.

The library is built on demand from ``native/src/*.cc`` with g++ (see
build.py). Kill switch: env var ``AIRCOMPRESSOR_TPU_DISABLE_NATIVE=1``
(analogue of sysprop io.airlift.compress.v3.disable-native,
reference: internal/NativeLoader.java:158-160).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOAD_ERROR: Optional[BaseException] = None
_TRIED = False


def _disabled() -> bool:
    return os.environ.get("AIRCOMPRESSOR_TPU_DISABLE_NATIVE", "") not in ("", "0")


def _try_load() -> None:
    global _LIB, _LOAD_ERROR, _TRIED
    if _TRIED:
        return
    _TRIED = True
    if _disabled():
        _LOAD_ERROR = RuntimeError("native tier disabled by AIRCOMPRESSOR_TPU_DISABLE_NATIVE")
        return
    try:
        from . import build

        path = build.ensure_built()
        lib = ctypes.CDLL(path)
        _declare(lib)
        _LIB = lib
    except BaseException as e:  # noqa: BLE001 — mirror NativeLoader's LinkageError capture
        _LOAD_ERROR = e


def _declare(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.actpu_xxh32.restype = ctypes.c_uint32
    lib.actpu_xxh32.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint32]
    lib.actpu_xxh64.restype = ctypes.c_uint64
    lib.actpu_xxh64.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint64]
    lib.actpu_crc32c.restype = ctypes.c_uint32
    lib.actpu_crc32c.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint32]
    for name in ("actpu_lz4_compress", "actpu_snappy_compress"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t, ctypes.c_int]
    for name in ("actpu_lz4_decompress", "actpu_snappy_decompress"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.actpu_inflate_plan_batch.restype = None
    lib.actpu_inflate_plan_batch.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, i32p,
        ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p]


def is_enabled() -> bool:
    _try_load()
    return _LIB is not None


def load_error() -> Optional[BaseException]:
    _try_load()
    return _LOAD_ERROR


def verify_enabled() -> None:
    if not is_enabled():
        raise RuntimeError(f"native tier is not available: {_LOAD_ERROR}")


def _buf(data) -> tuple:
    arr = data if isinstance(data, np.ndarray) else np.frombuffer(memoryview(data), dtype=np.uint8)
    arr = np.ascontiguousarray(arr.view(np.uint8).reshape(-1))
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size


def xxh32(data, seed: int = 0) -> int:
    verify_enabled()
    _, p, n = _buf(data)
    return int(_LIB.actpu_xxh32(p, n, seed & 0xFFFFFFFF))


def xxh64(data, seed: int = 0) -> int:
    verify_enabled()
    _, p, n = _buf(data)
    return int(_LIB.actpu_xxh64(p, n, seed & 0xFFFFFFFFFFFFFFFF))


def crc32c(data, crc: int = 0) -> int:
    verify_enabled()
    _, p, n = _buf(data)
    return int(_LIB.actpu_crc32c(p, n, crc & 0xFFFFFFFF))


def lz4_compress(src: np.ndarray, dst: np.ndarray, acceleration: int = 1) -> int:
    verify_enabled()
    _, sp, sn = _buf(src)
    _, dp, dn = _buf(dst)
    r = int(_LIB.actpu_lz4_compress(sp, sn, dp, dn, acceleration))
    if r < 0:
        raise ValueError(f"native lz4 compress failed ({r})")
    return r


def lz4_decompress(src: np.ndarray, dst: np.ndarray) -> int:
    from aircompressor_tpu.errors import MalformedInputException

    verify_enabled()
    _, sp, sn = _buf(src)
    _, dp, dn = _buf(dst)
    r = int(_LIB.actpu_lz4_decompress(sp, sn, dp, dn))
    if r < 0:
        raise MalformedInputException(-r - 1, "native lz4 decompress failed")
    return r


def snappy_compress(src: np.ndarray, dst: np.ndarray) -> int:
    verify_enabled()
    _, sp, sn = _buf(src)
    _, dp, dn = _buf(dst)
    r = int(_LIB.actpu_snappy_compress(sp, sn, dp, dn, 0))
    if r < 0:
        raise ValueError(f"native snappy compress failed ({r})")
    return r


def snappy_decompress(src: np.ndarray, dst: np.ndarray) -> int:
    from aircompressor_tpu.errors import MalformedInputException

    verify_enabled()
    _, sp, sn = _buf(src)
    _, dp, dn = _buf(dst)
    r = int(_LIB.actpu_snappy_decompress(sp, sn, dp, dn))
    if r < 0:
        raise MalformedInputException(-r - 1, "native snappy decompress failed")
    return r
