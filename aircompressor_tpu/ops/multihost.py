"""Multi-host (multi-controller) scale-out for the codec pipelines.

The reference has no distributed layer at all (single-threaded per call —
SURVEY.md §2.9); scale-out is this framework's TPU-native addition
(SURVEY.md §5.8): ``jax.distributed.initialize`` + one global
``jax.sharding.Mesh`` spanning every chip of every host, with the SAME
shard_map pipelines as the single-host path (ops/pipeline.py) — XLA routes
the collectives over ICI within a slice and DCN across hosts.

Pattern (multi-controller jit):
- every process calls :func:`initialize` with the coordinator address and
  its process index (on Cloud TPU the arguments auto-detect);
- inputs are built per-process with
  ``jax.make_array_from_process_local_data`` (each host feeds its local
  batch rows) onto the global mesh;
- jit/shard_map runs the SAME program in every process; cross-host psum
  totals come back replicated, per-chunk outputs stay host-local.

Off-TPU the same code runs multi-process on CPU via gloo TCP collectives —
that is how tests/test_multihost.py exercises a 2-process × 4-device mesh
on this single machine.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Gated ``jax.distributed.initialize``.

    On Cloud TPU pods every argument auto-detects (call with no args under
    the TPU runtime). On CPU/GPU pass them explicitly. Safe to call once
    per process, before any other jax API touches the backend.
    """
    # NOTE: must not touch the backend (jax.devices()/default_backend())
    # before jax.distributed.initialize — inspect config/state only.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized by the runtime
    platforms = jax.config.jax_platforms or ""
    if "cpu" in platforms:
        # cross-process CPU collectives need gloo (TCP)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "dp") -> Mesh:
    """One mesh over every device of every process (global batch axis)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def make_global_batch(mesh: Mesh, local_data: np.ndarray,
                      local_lengths: np.ndarray):
    """Assemble the global sharded (B, L) batch from per-process rows.

    Every process contributes its local chunk rows; the resulting global
    arrays are laid out along the mesh's batch axis WITHOUT any data
    movement (each row stays on the host that provided it)."""
    sh_data = NamedSharding(mesh, P("dp", None))
    sh_len = NamedSharding(mesh, P("dp"))
    data = jax.make_array_from_process_local_data(sh_data, local_data)
    lengths = jax.make_array_from_process_local_data(
        sh_len, local_lengths.astype(np.int32))
    return data, lengths


def distributed_checksum(mesh: Mesh):
    """The sharded checksum pipeline bound to a (possibly multi-host) mesh."""
    from . import pipeline

    return jax.jit(pipeline.sharded_checksum_step(mesh))


def distributed_compress(mesh: Mesh, out_cap: int | None = None):
    from . import pipeline

    return jax.jit(pipeline.sharded_compress(mesh, out_cap=out_cap))


def distributed_decompress(mesh: Mesh, out_cap: int = 65536):
    from . import pipeline

    return jax.jit(pipeline.sharded_decompress(mesh, out_cap=out_cap))


def local_rows(global_array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in batch order
    (the per-host half of the ordered frame assembly — SURVEY.md §5.8)."""
    shards = sorted(
        (s for s in global_array.addressable_shards),
        key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def scaling_report(mesh: Mesh, seconds_1dev: float, seconds_mesh: float,
                   total_bytes: int) -> dict:
    """Throughput + efficiency summary for a mesh run vs a 1-device run."""
    n = mesh.devices.size
    t1 = total_bytes / seconds_1dev if seconds_1dev else 0.0
    tn = total_bytes / seconds_mesh if seconds_mesh else 0.0
    return {
        "devices": int(n),
        "processes": jax.process_count(),
        "GBps_1dev": t1 / 1e9,
        "GBps_mesh": tn / 1e9,
        "scaling_efficiency": (tn / (t1 * n)) if t1 else 0.0,
    }
