"""Snappy block-format constants (format spec: google/snappy format_description.txt;
behavioral parity target: reference snappy/SnappyRawCompressor.java)."""

LITERAL = 0b00
COPY_1_BYTE_OFFSET = 0b01
COPY_2_BYTE_OFFSET = 0b10
COPY_4_BYTE_OFFSET = 0b11

BLOCK_LOG = 16
BLOCK_SIZE = 1 << BLOCK_LOG     # matches never cross 64KB block restarts
MIN_MATCH = 4
INPUT_MARGIN = 15               # tail handled as literals
MAX_HASH_TABLE_BITS = 14        # 16K entries (reference clamp [256, 16384])


def max_compressed_length(n: int) -> int:
    """Worst-case bound 32 + n + n/6 (reference: SnappyRawCompressor.java:47-70)."""
    if n < 0:
        raise ValueError("negative length")
    return 32 + n + n // 6
