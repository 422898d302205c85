"""GaN(0001) canonical sampling with the Nord-2003 Tersoff potential —
mirror of the reference's GaN_0001.ipynb (canonical Ga/N exchange with
on-device relaxation). Run: python examples/02_gan0001_canonical.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from surface_sampling_tpu.core import EngineConfig, RelaxConfig, geometric_schedule
from surface_sampling_tpu.systems import gan0001_tersoff


def main():
    sys = gan0001_tersoff(size=(3, 3), layers=4, relax=RelaxConfig(steps=20, fmax=0.05))
    temps = geometric_schedule(1.0, 10, alpha=0.95)
    cfg = EngineConfig(sweep_size=20, canonical=True, num_ads_atoms=9)
    state, rec = sys.run.run(jax.random.PRNGKey(0), temps, cfg=cfg)
    e = np.asarray(rec.energy)
    print(f"{len(sys.spec.site_coords)} sites, {sys.spec.n_pristine} slab atoms")
    print(f"energies per sweep: {np.round(e, 3)}")
    print(f"best: {e.min():.4f} eV, adsorbed atoms: {np.asarray(rec.n_ads)[-1]}")


if __name__ == "__main__":
    main()
