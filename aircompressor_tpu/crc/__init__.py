from .crc32c import Crc32C, crc32c_raw, mask_crc, masked_crc32c

__all__ = ["Crc32C", "crc32c_raw", "mask_crc", "masked_crc32c"]
