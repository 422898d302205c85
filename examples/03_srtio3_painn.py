"""SrTiO3(001) sampling with the trained PaiNN ensemble — mirror of the
reference's SrTiO3_001.ipynb (semigrand Sr/Ti/O with chemical potentials,
offset surface energy, BFGS->FIRE relaxation).
Run: python examples/03_srtio3_painn.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import time

import jax
import numpy as np

from surface_sampling_tpu.core import EngineConfig, RelaxConfig, geometric_schedule
from surface_sampling_tpu.systems import srtio3_001_painn


def main():
    sys = srtio3_001_painn(relax=RelaxConfig(steps=20, fmax=0.05))
    # reference tutorial: 10 sweeps x 5 steps at constant T = 1.0
    temps = np.repeat(1.0, 10)
    t0 = time.perf_counter()
    state, rec = sys.run.run(
        jax.random.PRNGKey(0), temps, cfg=EngineConfig(sweep_size=5)
    )
    dt = time.perf_counter() - t0
    e = np.asarray(rec.energy)
    print(f"Time taken = {dt:.1f} s (reference tutorial: ~606 s on an RTX 2080 Ti)")
    print(f"surface energies per sweep: {np.round(e, 3)}")
    print(f"best surface energy: {e.min():.3f} eV")


if __name__ == "__main__":
    main()
