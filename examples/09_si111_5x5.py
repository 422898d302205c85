"""Si(111) 5x5 adatom sampling with Stillinger-Weber — mirror of the
reference's Si(111) 5x5 tutorial (tutorials/Si_111_5x5): the exact
100-atom pristine slab (bottom 75 frozen, bulk_index=75), canonical
sampling of Si adatoms with on-device FIRE relaxation, acceptance
energies from SW85 (the tutorial's energy model,
lammps_energy_template.txt:18).

The tutorial RELAXES under the SRS-1996 modified SW (KIM
ThreeBodyCluster_SRS_StephensonRadnySmith_1996_Si,
lammps_opt_template.txt:18) while accepting on SW85 energies; pass a
KIM/LAMMPS parameter file for the SRS model via --srs to reproduce that
dual-potential split (the SRS constants are not redistributable here).

Run: python examples/09_si111_5x5.py [--srs /path/to/srs.sw]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse

import jax
import numpy as np

from surface_sampling_tpu.core import EngineConfig, RelaxConfig, geometric_schedule
from surface_sampling_tpu.systems import si111_sw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--srs", default=None,
                    help="LAMMPS .sw parameter file for the SRS relax model")
    ap.add_argument("--adatoms", type=int, default=6)
    ap.add_argument("--sweeps", type=int, default=8)
    args = ap.parse_args()

    sys = si111_sw(relax=RelaxConfig(steps=15, fmax=0.05),
                   relax_model=args.srs)
    print(f"{sys.spec.n_pristine}-atom slab "
          f"({int(sys.spec.frozen_pristine.sum())} frozen), "
          f"{len(sys.spec.site_coords)} adsorption sites")
    temps = geometric_schedule(0.5, args.sweeps, alpha=0.9)
    cfg = EngineConfig(sweep_size=10, canonical=True,
                       num_ads_atoms=args.adatoms,
                       prep_max_steps=200, prep_force_fill=True)
    state, rec = sys.run.run(jax.random.PRNGKey(0), temps, cfg=cfg)
    e = np.asarray(rec.energy)
    print(f"SW85 energies per sweep: {np.round(e, 3)}")
    print(f"best: {e.min():.4f} eV with {int(np.asarray(rec.n_ads)[-1])} adatoms")


if __name__ == "__main__":
    main()
