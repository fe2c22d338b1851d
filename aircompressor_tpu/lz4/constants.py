"""LZ4 block-format constants (format spec: lz4_Block_format.md; behavioral
parity target: reference lz4/Lz4Constants.java:16-26, Lz4RawCompressor.java)."""

MIN_MATCH = 4
LAST_LITERALS = 5          # last 5 bytes of a block are always literals
MF_LIMIT = 12              # matches must not start within this distance of end
MAX_DISTANCE = 65535       # 16-bit offsets
ML_BITS = 4
ML_MASK = (1 << ML_BITS) - 1  # 15
RUN_MASK = ML_MASK
MAX_INPUT_SIZE = 0x7E000000

HASH_LOG = 15              # our table: 32K entries (reference clamps to 4K —
                           # a larger table only improves ratio)
SKIP_TRIGGER = 6           # acceleration skip strength (same as reference)


def max_compressed_length(n: int) -> int:
    """Exact LZ4 worst-case bound (reference: Lz4RawCompressor.java:64-67)."""
    if n < 0:
        raise ValueError("negative length")
    return n + n // 255 + 16
