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


def test_entry_forward_jits():
    import __graft_entry__ as g

    fn, args = g.entry()
    e, f = jax.jit(fn)(*args)
    assert np.isfinite(float(e))
    assert np.all(np.isfinite(np.asarray(f)))
