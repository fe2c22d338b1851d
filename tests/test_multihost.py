"""Multi-host (2-process) mesh dryrun on CPU — exercises the
jax.distributed path of ops/multihost.py with gloo TCP collectives:
2 processes × 4 virtual CPU devices = one global 8-device mesh.
(SURVEY.md §5.8; the reference has no distributed layer at all.)
"""

import socket
import subprocess
import sys

import pytest

from tests.conftest import cpu_mesh_env

WORKER = r"""
import sys
import numpy as np

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]

from aircompressor_tpu.ops import multihost
multihost.initialize(coord, nproc, proc_id)

import jax
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 4, len(jax.devices())

mesh = multihost.global_mesh()
B_local, L = 8, 1024
rng = np.random.default_rng(proc_id)
raw = (rng.integers(0, 64, (B_local, L)).astype(np.uint8) // 16) * 7  # compressible
lengths = np.full(B_local, L, np.int32)
data, lens = multihost.make_global_batch(mesh, raw, lengths)
assert data.shape[0] == nproc * B_local  # global batch

# full compress pipeline across both processes
comp_fn = multihost.distributed_compress(mesh)
comp, clens, total = comp_fn(data, lens)
total = int(total)  # psum across the global mesh — replicated result

# checksum pipeline (psum'd byte count must be the GLOBAL total)
ck = multihost.distributed_checksum(mesh)(data, lens)
assert int(ck["bytes"]) == nproc * B_local * L, int(ck["bytes"])

# this process's local compressed rows decode back to its raw rows
# (local_rows returns only this host's addressable rows, batch-ordered)
rows = multihost.local_rows(comp)
cl = multihost.local_rows(clens)
assert rows.shape[0] == B_local, rows.shape
from aircompressor_tpu.snappy import SnappyRefDecompressor
dec = SnappyRefDecompressor()
for i in range(B_local):
    blob = rows[i, : cl[i]].tobytes()
    assert dec.decompress(blob, L) == raw[i].tobytes(), f"row {i} mismatch"

print(f"proc {proc_id}: OK total={total}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = cpu_mesh_env(4)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd="/root/repo")
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: OK" in out, out[-2000:]
