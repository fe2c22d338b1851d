"""Exception types for the codec suite.

Mirrors the reference's error surface (reference: io/airlift/compress/v3/
MalformedInputException.java, IncompatibleJvmException.java) with a Python-first
design: exceptions carry the byte offset of the failure and a reason string.
"""

from __future__ import annotations


class MalformedInputException(ValueError):
    """Raised when a compressed stream is invalid or corrupt.

    Carries the input byte offset at which the malformation was detected
    (reference: MalformedInputException.java:18-31).
    """

    def __init__(self, offset: int, reason: str = "Malformed input"):
        self.offset = int(offset)
        self.reason = reason
        super().__init__(f"{reason}: offset={offset}")


class IncompatiblePlatformException(RuntimeError):
    """Raised when a backend tier cannot run on the current platform.

    Analogue of the reference's IncompatibleJvmException: our tiers are
    (numpy reference, native C++, TPU/Pallas) instead of (Java, FFM-native).
    """
