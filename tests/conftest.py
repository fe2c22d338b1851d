"""Test configuration.

Single-device JAX tests run on whatever backend the environment provides
(real TPU chip under axon, else CPU). Multi-chip sharding tests cannot change
the platform in-process (the axon sitecustomize pre-imports jax), so they run
in a SUBPROCESS with a virtual 8-device CPU mesh — see cpu_mesh_env() below
and tests/test_multichip.py.
"""

import os
import subprocess
import sys

# Persistent XLA compilation cache: the Pallas megakernels take tens of
# seconds to compile and every pytest process would otherwise recompile
# them from scratch.
try:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # noqa: BLE001 - cache is an optimization only
    pass


def _guard_dead_device_pool() -> None:
    """The tunneled TPU pool sometimes goes fully unreachable (jax.devices()
    hangs forever, not a per-claim slowdown). Probe it in a SUBPROCESS with
    a hard timeout and redirect this test session to CPU if it is down —
    backend init is lazy, so jax.config still takes effect here."""
    if (os.environ.get("JAX_PLATFORMS", "") or "").lower() not in ("", "axon"):
        return  # explicitly pinned platform (e.g. the CPU-mesh subprocesses)
    code = ("import jax, numpy as np, jax.numpy as jnp;"
            "np.asarray(jnp.zeros((8,128),jnp.int32)+1)")
    try:
        subprocess.run([sys.executable, "-c", code], timeout=30.0, check=True,
                       capture_output=True,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    except Exception:  # noqa: BLE001 - unreachable or broken pool
        import jax

        jax.config.update("jax_platforms", "cpu")
        print("[conftest] device pool unreachable - tests run on CPU",
              file=sys.stderr)


_guard_dead_device_pool()


def cpu_mesh_env(n_devices: int = 8) -> dict:
    """Environment for a subprocess with n virtual CPU jax devices."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon PJRT registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


def run_in_cpu_mesh(code: str, n_devices: int = 8, timeout: int = 600):
    """Run python code in a virtual-CPU-mesh subprocess; returns CompletedProcess."""
    return subprocess.run(
        [sys.executable, "-c", code],
        env=cpu_mesh_env(n_devices),
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )

import glob
import os.path
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"
TESTDATA = os.path.join(REFERENCE_ROOT, "testdata")
NATIVE_ORACLE_DIR = os.path.join(
    REFERENCE_ROOT, "src/main/resources/aircompressor/linux-amd64"
)


def has_testdata() -> bool:
    return os.path.isdir(TESTDATA)


def corpus_files(limit_bytes: int | None = None) -> list[tuple[str, bytes]]:
    """Small benchmark-corpus sample for correctness tests."""
    names = [
        "urls.10K",
        "html",
        "geo.protodata",
        "kppkn.gtb",
        "canterbury/alice29.txt",
        "canterbury/xargs.1",
        "calgary/obj2",
        "calgary/pic",
    ]
    out = []
    for name in names:
        path = os.path.join(TESTDATA, name)
        if os.path.exists(path):
            data = open(path, "rb").read()
            if limit_bytes:
                data = data[:limit_bytes]
            out.append((name, data))
    return out


def synthetic_cases() -> list[tuple[str, bytes]]:
    """Synthetic inputs mirroring the reference's in-memory cases
    (AbstractTestCompression.java:47-56)."""
    rng = np.random.default_rng(0)
    return [
        ("empty", b""),
        ("one-byte", b"X"),
        ("short", b"hello world"),
        ("zeros", bytes(10000)),
        ("ones-rle", b"\x01" * 4096),
        ("random-incompressible", rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()),
        ("repeated-pattern", b"abcdefgh" * 8192),
        ("small-period", b"ab" * 5000),
        ("alternating", bytes(bytearray([i & 0xFF for i in range(70000)]))),
        ("text", (b"The quick brown fox jumps over the lazy dog. " * 2000)),
    ]


@pytest.fixture(scope="session")
def corpus():
    if not has_testdata():
        pytest.skip("reference testdata not available")
    return corpus_files(limit_bytes=600_000)


@pytest.fixture(scope="session")
def synthetic():
    return synthetic_cases()
