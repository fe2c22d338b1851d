"""aircompressor_tpu — a TPU-native lossless compression codec suite.

Brand-new framework with the capabilities of airlift/aircompressor:
LZ4 / Snappy / Zstd block + frame formats (bit-compatible on decompress),
LZO / bzip2 / deflate / gzip compatibility codecs, Hadoop-compatible stream
formats, and xxHash32/64 + CRC32C checksums — designed TPU-first in
JAX/Pallas with a pure numpy reference tier and a C++ host native tier.
"""

from .api import BufferLike, Compressor, Decompressor
from .errors import IncompatiblePlatformException, MalformedInputException

__version__ = "0.1.0"

__all__ = [
    "BufferLike",
    "Compressor",
    "Decompressor",
    "IncompatiblePlatformException",
    "MalformedInputException",
]


def __getattr__(name):
    """Lazy codec-family access: aircompressor_tpu.lz4 / snappy / zstd /
    lzo / bzip2 / deflate / gzip / xxhash / crc / hadoop / ops / native."""
    import importlib

    if name in ("lz4", "snappy", "zstd", "lzo", "bzip2", "deflate", "gzip",
                "xxhash", "crc", "hadoop", "ops", "native"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
