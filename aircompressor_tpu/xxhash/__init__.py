"""xxHash family (reference: xxhash/ package, 2817 LoC).

Public surface mirrors the reference's hashers (XxHash32Hasher /
XxHash64Hasher static one-shots + streaming states) with tier dispatch:
the scalar tier is always available; a native C++ tier is preferred when the
shared library is built (see aircompressor_tpu.native)."""

from __future__ import annotations

from ._scalar import (
    XxHash32State,
    XxHash64State,
    xxh32 as _xxh32_scalar,
    xxh64 as _xxh64_scalar,
)


def xxh32(data, seed: int = 0) -> int:
    from aircompressor_tpu import native

    if native.is_enabled():
        return native.xxh32(data, seed)
    return _xxh32_scalar(data, seed)


def xxh64(data, seed: int = 0) -> int:
    from aircompressor_tpu import native

    if native.is_enabled():
        return native.xxh64(data, seed)
    return _xxh64_scalar(data, seed)


from .xxh3 import (  # noqa: E402 — native-only tier, mirrors XxHash3Native
    XxHash3Hasher,
    XxHash3Hasher128,
    XxHash128,
    xxh3_64,
    xxh3_128,
)
from .xxh3 import is_enabled as xxh3_is_enabled  # noqa: E402

__all__ = [
    "xxh32",
    "xxh64",
    "XxHash32State",
    "XxHash64State",
    "xxh3_64",
    "xxh3_128",
    "xxh3_is_enabled",
    "XxHash3Hasher",
    "XxHash3Hasher128",
    "XxHash128",
]
