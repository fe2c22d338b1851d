"""Build the native kernel library from C++ sources with g++.

The library is cached next to the sources; rebuilt when any source is newer.
No external dependencies: plain C ABI exported with extern "C", loaded via
ctypes (this environment has no pybind11; ctypes keeps the boundary thin).
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from pathlib import Path

SRC_DIR = Path(__file__).parent / "src"
LIB_NAME = "libaircompressor_tpu.so"


def lib_path() -> Path:
    return Path(__file__).parent / LIB_NAME


def ensure_built() -> str:
    sources = sorted(SRC_DIR.glob("*.cc"))
    if not sources:
        raise FileNotFoundError(f"no native sources under {SRC_DIR}")
    out = lib_path()
    if out.exists() and all(out.stat().st_mtime >= s.stat().st_mtime for s in sources):
        return str(out)
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-funroll-loops",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        str(out),
        *map(str, sources),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return str(out)


if __name__ == "__main__":
    print(ensure_built())
