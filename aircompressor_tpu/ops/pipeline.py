"""Flagship device pipelines and multi-chip sharding.

The framework's unit of device work is a BATCH of independent chunks
(padded (B, L) uint8 + lengths) — the formats' own restart boundaries
(SURVEY.md §2.9). This module assembles the per-chunk kernels into jittable
pipelines and shards them data-parallel over a ``jax.sharding.Mesh``:
chunks are split along the batch axis ("dp"), per-chunk results are computed
locally, and scalar accounting rides ``psum`` — the TPU-native counterpart of
the reference's caller-side thread parallelism (reference:
lz4/Lz4JavaCompressor.java:27-29 "not thread-safe", parallelism is the
caller's job).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from . import checksum_jax, xxhash_jax


def checksum_step(data, lengths):
    """Per-batch checksum pipeline: xxh64 (zstd frames), xxh32 (lz4 frames),
    masked crc32c (snappy framing) over B chunks at once."""
    hi, lo = xxhash_jax.xxh64(data, lengths)
    h32 = xxhash_jax.xxh32(data, lengths)
    crc = checksum_jax.mask_crc(checksum_jax.crc32c(data, lengths))
    total = jnp.sum(lengths)
    return {"xxh64_hi": hi, "xxh64_lo": lo, "xxh32": h32, "crc32c": crc, "bytes": total}


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_checksum_step(mesh: Mesh):
    """Data-parallel checksum step over the mesh: batch sharded on "dp",
    per-chunk outputs stay sharded, byte-count is psum-reduced."""

    def step(data, lengths):
        out = checksum_step(data, lengths)
        out["bytes"] = jax.lax.psum(out["bytes"], "dp")
        return out

    return shard_map(
        step,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp")),
        out_specs={
            "xxh64_hi": P("dp"),
            "xxh64_lo": P("dp"),
            "xxh32": P("dp"),
            "crc32c": P("dp"),
            "bytes": P(),
        },
    )
