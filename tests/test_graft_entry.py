"""Regression tests for the driver-facing entry points.

The driver runs ``__graft_entry__.dryrun_multichip(N)`` in a fresh
process where JAX may default to a single remote-TPU device; round 1
shipped a version that forgot the platform override and the gate
failed (MULTICHIP_r01.json).  These tests pin both the subprocess
behaviour (no conftest help — the function must force its own virtual
CPU mesh) and the in-process behaviour under the test mesh.
"""

import subprocess
import sys

import pytest

from tests.conftest import REPO


@pytest.mark.slow
def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, (params, batch) = ge.entry()
    out = jax.jit(fn)(params, batch)
    jax.block_until_ready(out)


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    # Fresh interpreter with NO platform/device env help: the function
    # itself must force the 8-device virtual CPU mesh (the driver's gate).
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root"}
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "pipeline ok" in proc.stdout
