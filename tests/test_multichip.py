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
