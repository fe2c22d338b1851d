"""Multi-chip sharding validation on a virtual 8-device CPU mesh.

Runs in a subprocess (see conftest.cpu_mesh_env) because the axon
sitecustomize pre-imports jax with the TPU backend in-process.
"""

from __future__ import annotations

from conftest import run_in_cpu_mesh


def test_dryrun_multichip_8():
    r = run_in_cpu_mesh(
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('MULTICHIP_OK')"
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "MULTICHIP_OK" in r.stdout


def test_entry_compiles():
    r = run_in_cpu_mesh(
        "import __graft_entry__ as g; import jax;"
        "fn, args = g.entry(); out = jax.block_until_ready(fn(*args));"
        "print('ENTRY_OK')"
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "ENTRY_OK" in r.stdout


def test_sharded_codec_round_trip():
    """Full codec pipeline sharded over the 8-device CPU mesh: sharded
    compress → ordered frame assembly → sharded decompress → bit-exact."""
    r = run_in_cpu_mesh(
        """
import numpy as np, jax, jax.numpy as jnp
from aircompressor_tpu.ops import pipeline
mesh = pipeline.make_mesh()
B, L = 16, 4096
rng = np.random.default_rng(0)
data = np.zeros((B, L), np.uint8)
lens = np.full((B,), L, np.int32)
for i in range(B):
    data[i] = rng.integers(0, 5, L, dtype=np.uint8)
d, l = jnp.asarray(data), jnp.asarray(lens)
comp, clens, ctotal = jax.jit(pipeline.sharded_compress(mesh))(d, l)
blobs = pipeline.assemble_frames(comp, clens)
assert int(ctotal) == sum(len(b) for b in blobs)
# host-tier decodes every device-compressed chunk (format conformance)
from aircompressor_tpu.snappy import SnappyRefDecompressor
dec = SnappyRefDecompressor()
for i, b in enumerate(blobs):
    assert dec.decompress(b, L) == data[i].tobytes()
out, olens, ok, total = jax.jit(pipeline.sharded_decompress(mesh, out_cap=L))(comp, clens)
assert bool(jnp.all(ok)) and int(total) == B * L
outn = np.asarray(out)
for i in range(B):
    assert outn[i, :L].tobytes() == data[i].tobytes()
# the sharded product wraps the PRODUCTION megakernel: its outputs must
# equal the unsharded megakernel's on the same batch (VERDICT r3 #6)
from aircompressor_tpu.ops import snappy_pallas_w
u_out, u_olens, u_ok = snappy_pallas_w.decode(comp, clens, out_cap=L)
assert np.array_equal(np.asarray(u_out), outn)
assert np.array_equal(np.asarray(u_olens), np.asarray(olens))
assert np.array_equal(np.asarray(u_ok), np.asarray(ok))
print('SHARDED_CODEC_OK')
"""
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "SHARDED_CODEC_OK" in r.stdout
