"""Electrochemical (Pourbaix) surface sampling — mirror of the reference's
sample_pourbaix_surface workflow: dominant aqueous species at (pH, phi)
from serialized diagrams, grand-potential acceptance energy, OH/H2O group
moves, and surface-atom sampling. Uses the Sr-Ir-O test diagrams.
Run: python examples/07_pourbaix_sampling.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from surface_sampling_tpu.core import EngineConfig, MCMCRun, geometric_schedule, make_spec
from surface_sampling_tpu.potentials import make_lennard_jones
from surface_sampling_tpu.pourbaix import (
    generate_pourbaix_atoms,
    make_pourbaix_surface_energy,
)
from surface_sampling_tpu.structure import Structure, find_adsorption_sites


def main():
    from pathlib import Path

    data = Path(__file__).resolve().parents[1] / "tests" / "data" / "pourbaix"
    pH, phi = 7.0, 0.5
    pbx_atoms = generate_pourbaix_atoms(
        str(data / "pd_dict.json"),
        str(data / "pbx_dict.json"),
        phi, pH, ("Sr", "Ir", "O"),
    )
    for atom in pbx_atoms.values():
        print(atom)

    # toy IrO2-like slab with a generic pair potential standing in for a NN
    slab = Structure.from_symbols(
        ["Ir"] * 4 + ["O"] * 4,
        [[0, 0, 5], [2.3, 0, 5], [0, 2.3, 5], [2.3, 2.3, 5],
         [1.15, 0, 6.3], [0, 1.15, 6.3], [2.3, 1.15, 6.3], [1.15, 2.3, 6.3]],
        np.diag([4.6, 4.6, 22.0]),
    )
    sites = find_adsorption_sites(slab, planar_distance=1.6)["all"]
    spec = make_spec(
        slab, sites, ["O", "H", "HO", "H2O"],
        potential_numbers=[77, 8, 1], cutoff=4.5, surface_name="IrO2_toy",
    )
    pot = make_lennard_jones(epsilon=2.0, sigma=1.9, cutoff=4.5)
    se_fn = make_pourbaix_surface_energy(
        spec, pbx_atoms, phi=phi, pH=pH,
        adsorbate_corrections={"OH": 0.23 - 0.30},
    )
    run = MCMCRun(spec, pot, surface_energy_fn=se_fn)
    temps = geometric_schedule(0.2, 10, alpha=0.9)
    state, rec = run.run(jax.random.PRNGKey(0), temps, cfg=EngineConfig(sweep_size=10))
    e = np.asarray(rec.energy)
    print(f"\nPourbaix potentials per sweep at pH={pH}, phi={phi} V:")
    print(np.round(e, 3))
    print(f"best: {e.min():.3f} eV, occupied sites: {int(np.asarray(rec.n_ads)[-1])}")


if __name__ == "__main__":
    main()
