"""TPU-backend tolerance pin for the CHGNet goldens (VERDICT r2 weak #8).

The committed goldens (tests/data/chgnet_golden.json) were produced on
f32 CPU; this test re-evaluates the same cases on the REAL TPU backend
and pins the backend deviation, so a TPU numerics regression in the
CHGNet path (Mosaic lowering, matmul precision defaults, the remote
compile helper) is caught by CI run in the TPU environment.

The test suite forces the CPU platform in conftest.py (the virtual
8-device mesh), so this test re-executes in a clean subprocess that
keeps the default (axon TPU) backend. It is opt-in via SST_TPU_TESTS=1:
the TPU path needs the axon tunnel and a multi-minute remote compile,
neither of which exists on the CPU-only CI box.

Measured TPU-vs-golden deviations at the time of pinning (2026-08-19,
v5e via axon): |dE_total| <= 6.2e-5 eV, per-atom <= 7.7e-6 eV,
magmoms <= 2.7e-6 uB, embedding norm rel <= 8.3e-7. Tolerances below
hold ~10x margin.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parents[1]

_PROBE = r"""
import json, sys
import numpy as np
import jax
import jax.numpy as jnp
from pathlib import Path
from surface_sampling_tpu.models.convert_chgnet import load_chgnet_npz
from surface_sampling_tpu.models.chgnet import chgnet_apply
from surface_sampling_tpu.ops.neighbors import pair_shifts_for

assert jax.default_backend() != "cpu", (
    "TPU pin test subprocess landed on the CPU backend")
DATA = Path(sys.argv[1]) / "surface_sampling_tpu"
params, cfg = load_chgnet_npz(DATA / "models/data/lamno3_chgnet.npz")
d = np.load(DATA / "systems_data/LaMnO3_001_2x2x3.npz")
pos, numbers, cell = d["positions"], d["numbers"], d["cell"]
golden = json.loads((Path(sys.argv[1]) / "tests/data/chgnet_golden.json").read_text())
rng = np.random.default_rng(12345)
cases = []
for case in golden["cases"]:
    p = pos + case["perturbation_scale"] * rng.standard_normal(pos.shape)
    frac = np.linalg.solve(np.asarray(cell).T, np.asarray(p).T).T
    shifts = jnp.asarray(pair_shifts_for(cell, frac, cfg.atom_graph_cutoff), jnp.float32)
    out = chgnet_apply(params, cfg, jnp.asarray(p, jnp.float32), jnp.asarray(numbers),
                       jnp.ones(len(numbers), bool), shifts)
    cases.append({
        "energy": float(out["energy"]),
        "per_atom_energy_first8": np.asarray(out["per_atom_energy"])[:8].tolist(),
        "magmom_first8": np.asarray(out["magmom"])[:8].tolist(),
        "embedding_norm": float(np.linalg.norm(np.asarray(out["embedding"]))),
    })
print(json.dumps(cases))
"""


@pytest.mark.skipif(
    not os.environ.get("SST_TPU_TESTS"),
    reason="TPU-backend pin: set SST_TPU_TESTS=1 on a box with the axon "
    "TPU tunnel (conftest forces CPU; this test subprocesses to the "
    "real backend and needs a multi-minute remote compile)",
)
def test_chgnet_goldens_hold_on_tpu_backend():
    env = dict(os.environ)
    # drop the conftest's virtual-device forcing; keep the axon plugin path
    env["XLA_FLAGS"] = " ".join(
        t for t in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in t
    )
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    r = subprocess.run(
        [sys.executable, "-c", _PROBE, str(REPO)],
        env=env, capture_output=True, text=True, timeout=570,
    )
    assert r.returncode == 0, f"TPU probe failed:\n{r.stderr[-2000:]}"
    tpu_cases = json.loads(r.stdout.strip().splitlines()[-1])
    golden = json.loads((REPO / "tests/data/chgnet_golden.json").read_text())
    for t, g in zip(tpu_cases, golden["cases"]):
        np.testing.assert_allclose(t["energy"], g["energy"], rtol=0, atol=5e-4)
        np.testing.assert_allclose(
            np.array(t["per_atom_energy_first8"]),
            np.array(g["per_atom_energy_first8"]), rtol=0, atol=1e-4)
        np.testing.assert_allclose(
            np.array(t["magmom_first8"]), np.array(g["magmom_first8"]),
            rtol=0, atol=1e-4)
        np.testing.assert_allclose(
            t["embedding_norm"], g["embedding_norm"], rtol=1e-5, atol=0)
