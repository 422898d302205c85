"""Slab preparation from a bulk crystal — mirror of the reference's
prepare_surface.ipynb: cut a slab, find adsorption sites, export CIF.
Run: python examples/05_prepare_surface.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from surface_sampling_tpu.structure import bulk, find_adsorption_sites, surface_from_bulk
from surface_sampling_tpu.structure.io import write_cif
from surface_sampling_tpu.structure.slabs import SupercellSurfaceGenerator


def main():
    sto = bulk(["Sr", "Ti", "O"], "perovskite", a=3.905)
    slab, surf_mask = surface_from_bulk(sto, (0, 0, 1), size=(2, 2), layers=4, vacuum=12.0)
    print(f"slab: {slab.formula}, {len(slab)} atoms, {surf_mask.sum()} surface atoms")
    sites = find_adsorption_sites(slab, planar_distance=1.5)
    for fam in ("ontop", "bridge", "hollow"):
        print(f"{fam}: {len(sites[fam])} sites")
    write_cif("SrTiO3_001_slab.cif", slab)
    gen = SupercellSurfaceGenerator(sto, (0, 0, 1), min_slab_layers=3)
    rotated = gen.get_supercell_slab(2.0, 2.0, rotation=0.0)
    print(f"supercell slab: {rotated.formula}, {len(rotated)} atoms")
    print("wrote SrTiO3_001_slab.cif")


if __name__ == "__main__":
    main()
