"""64-bit unsigned arithmetic as (hi, lo) uint32 pairs for TPU.

TPUs have no native 64-bit integer datapath; XLA emulates u64 with u32 pairs.
We do the decomposition explicitly so kernels stay u32-native and work without
``jax_enable_x64``. A U64 is a tuple ``(hi, lo)`` of equal-shape uint32 arrays.

Multiplication uses 16-bit limb products (u32 × u32 full products are not
available on the VPU): a 64×64→64 multiply is 10 u32 multiplies of 16-bit
limbs plus shifts/adds.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
# numpy scalars (not jnp) so kernels can use them without constant capture
MASK16 = np.uint32(0xFFFF)

# All arithmetic here is intentionally mod-2^32 wrap-around. When operands are
# numpy scalars (e.g. two const() values combined on the host) numpy raises
# RuntimeWarning on overflow even though wrapping is exactly what we want, so
# silence overflow warnings for this module's functions only.
def _wrapping(fn):
    def inner(*args, **kwargs):
        with np.errstate(over="ignore"):
            return fn(*args, **kwargs)

    inner.__name__ = fn.__name__
    inner.__doc__ = fn.__doc__
    return inner


def const(v: int):
    """Lift a Python int to a scalar U64 pair (numpy scalars: usable both in
    regular jnp code and inside Pallas kernels)."""
    return np.uint32((v >> 32) & 0xFFFFFFFF), np.uint32(v & 0xFFFFFFFF)


@_wrapping
def add(a, b):
    hi_a, lo_a = a
    hi_b, lo_b = b
    lo = lo_a + lo_b
    carry = (lo < lo_a).astype(U32)
    return hi_a + hi_b + carry, lo


@_wrapping
def add_u32(a, b_lo):
    hi_a, lo_a = a
    lo = lo_a + b_lo
    carry = (lo < lo_a).astype(U32)
    return hi_a + carry, lo


@_wrapping
def sub(a, b):
    hi_a, lo_a = a
    hi_b, lo_b = b
    lo = lo_a - lo_b
    borrow = (lo_a < lo_b).astype(U32)
    return hi_a - hi_b - borrow, lo


def xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


@_wrapping
def _mul32(a, b):
    """Full 32×32→64 product of u32 arrays via 16-bit limbs → (hi, lo)."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + (p00 >> 16)
    mid2 = p10 + (mid & MASK16)
    lo = (mid2 << 16) | (p00 & MASK16)
    hi = p11 + (mid >> 16) + (mid2 >> 16)
    return hi, lo


@_wrapping
def mul(a, b):
    """64×64→64 (mod 2^64) multiply."""
    hi_a, lo_a = a
    hi_b, lo_b = b
    hi, lo = _mul32(lo_a, lo_b)
    hi = hi + lo_a * hi_b + hi_a * lo_b
    return hi, lo


def rotl(a, r: int):
    """Rotate left by a static amount 0 < r < 64."""
    hi, lo = a
    if r == 32:
        return lo, hi
    if r > 32:
        return rotl((lo, hi), r - 32)
    # 0 < r < 32
    sr = 32 - r
    return (hi << r) | (lo >> sr), (lo << r) | (hi >> sr)


def shr(a, r: int):
    """Logical shift right by a static amount 0 < r < 64."""
    hi, lo = a
    if r >= 32:
        return jnp.zeros_like(hi), hi >> (r - 32) if r > 32 else hi
    return hi >> r, (lo >> r) | (hi << (32 - r))


@_wrapping
def shl(a, r: int):
    hi, lo = a
    if r >= 32:
        return lo << (r - 32) if r > 32 else lo, jnp.zeros_like(lo)
    return (hi << r) | (lo >> (32 - r)), lo << r


def where(mask, a, b):
    return jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1])


def from_le_bytes(b8):
    """(..., 8) uint8 LE → U64."""
    b = b8.astype(U32)
    lo = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    hi = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)
    return hi, lo


def u32_from_le_bytes(b4):
    """(..., 4) uint8 LE → uint32."""
    b = b4.astype(U32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
