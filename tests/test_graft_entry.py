"""Driver-gate insurance: __graft_entry__ must keep working.

Round 1's only red gate was dryrun_multichip failing in the driver
environment (VERDICT.md item 1) — this test runs both entry points in
the suite's virtual 8-device CPU mesh so a regression is caught before
the driver runs them.
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile failure


def test_dryrun_falls_back_to_subprocess_when_backend_committed():
    """Driver scenario: the single-chip entry() check initializes a
    backend first (here: a 1-device CPU backend), so the platform can no
    longer satisfy the n-device mesh in-process — dryrun_multichip must
    re-exec itself in a clean child and still pass."""
    import os
    import subprocess

    repo = str(Path(__file__).parents[1])
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(2)" % repo
    )
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]


def test_entry_forward_jits():
    import __graft_entry__ as g

    fn, args = g.entry()
    e, f = jax.jit(fn)(*args)
    assert np.isfinite(float(e))
    assert np.all(np.isfinite(np.asarray(f)))
