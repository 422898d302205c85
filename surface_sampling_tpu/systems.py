"""Prebuilt example systems mirroring the reference's tutorials and tests.

  * Cu(100) + EAM — the minimum end-to-end slice (reference
    tutorials/example.ipynb, tests/test_Cu.py).
  * Au(110) + EAM canonical — exact test geometry (tests/test_Au.py; slab
    positions/cell recovered at full precision from the reference's
    Au_110_2x2 fixtures and vendored as systems_data/Au_110_2x2.npz).
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import numpy as np

from surface_sampling_tpu.constants import Z_FROM_SYMBOL
from surface_sampling_tpu.core import MCMCRun, RelaxConfig, make_spec
from surface_sampling_tpu.core.spec import SurfaceSpec
from surface_sampling_tpu.potentials import (
    Potential,
    builtin_eam,
    builtin_tersoff,
    make_eam,
    make_sw,
    make_tersoff,
    sw_tables,
)
from surface_sampling_tpu.structure import Structure, bulk, find_adsorption_sites, surface_from_bulk
from surface_sampling_tpu.structure.slabs import fcc100, fcc111

_DATA = Path(__file__).parent / "systems_data"


class ExampleSystem(NamedTuple):
    spec: SurfaceSpec
    potential: Potential
    run: MCMCRun


def cu100_eam(
    size=(2, 2, 2),
    a: float = 3.6147,
    vacuum: float = 15.0,
    planar_distance: float = 1.5,
    relax: RelaxConfig | None = None,
    fast: bool = False,
    dtype=None,
) -> ExampleSystem:
    """Cu(100) slab with EAM (Foiles u3) and Cu adsorption — the toy system
    of the reference's example notebook / Cu regression test
    (tests/test_Cu.py:28-52: a=3.6147, 2x2x2 slab, planar_distance 1.5).

    fast=True switches to the static-candidate-pair + piecewise-polynomial
    EAM path (gather-free; ~1e-6 eV table deviation)."""
    import jax.numpy as jnp

    slab = fcc100("Cu", size=size, a=a, vacuum=vacuum)
    sites = find_adsorption_sites(
        slab, planar_distance=planar_distance, near_reduce=0.01, no_obtuse_hollow=True
    )["all"]
    tables = builtin_eam("Cu_u3")
    spec = make_spec(
        slab,
        sites,
        ["Cu"],
        potential_numbers=tables.numbers,
        cutoff=tables.cutoff,
        surface_name="Cu_100",
    )
    if fast:
        from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
        from surface_sampling_tpu.potentials.eam import make_eam_static

        slack = 0.6 if relax is not None else 0.05
        nbr = build_static_neighbor_table(spec, tables.cutoff, relax_slack=slack)
        pot = make_eam_static(tables, nbr, mode="cheb", dtype=dtype or jnp.float32)
    else:
        pot = make_eam(tables, dtype=dtype or jnp.float32)
    return ExampleSystem(spec, pot, MCMCRun(spec, pot, relax=relax, dtype=dtype or jnp.float32))


def gan0001_tersoff(
    size=(3, 3),
    layers: int = 4,
    vacuum: float = 12.0,
    planar_distance: float = 1.2,
    surface_depth: int = 2,
    relax: RelaxConfig | None = None,
    max_neighbors: int = 16,
    fast: bool = False,
    dtype=None,
) -> ExampleSystem:
    """GaN(0001) wurtzite slab with the Nord-2003 Tersoff potential —
    the reference's GaN tutorial system (tutorials/GaN_0001.ipynb:
    canonical Ga/N sampling with LAMMPS Tersoff, bulk atoms frozen via
    ``setforce 0`` in lammps_opt_template.txt).

    ``fast=True`` (rigid runs only) swaps in the precomputed occupancy-
    algebra Tersoff (potentials/rigid_manybody.py; ~105x on TPU)."""
    import jax.numpy as jnp

    gan = bulk(["Ga", "N"], "wurtzite", a=3.19, c=5.19)
    slab, _ = surface_from_bulk(gan, (0, 0, 1), size=size, layers=layers, vacuum=vacuum)
    sites = find_adsorption_sites(slab, planar_distance=planar_distance)["all"]
    tables = builtin_tersoff("GaN_nord2003")
    spec = make_spec(
        slab,
        sites,
        ["Ga", "N"],
        potential_numbers=[Z_FROM_SYMBOL[e] for e in tables.elements],
        cutoff=tables.cutoff,
        surface_depth=surface_depth,
        surface_name="GaN_0001",
    )
    if fast and relax is None:
        from surface_sampling_tpu.potentials import make_tersoff_rigid

        pot = make_tersoff_rigid(tables, spec, dtype=dtype or jnp.float32)
    else:
        from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

        nbr = build_static_neighbor_table(
            spec, tables.cutoff, relax_slack=0.6 if relax is not None else 0.1
        )
        pot = make_tersoff(tables, max_neighbors=max_neighbors,
                           dtype=dtype or jnp.float32, static_nbr=nbr)
    return ExampleSystem(spec, pot, MCMCRun(spec, pot, relax=relax, dtype=dtype or jnp.float32))


# Bulk lattice constant implied by the reference's Si(111) 5x5 pristine
# slab (tutorials/data/Si_111_5x5/Si_111_5x5_pristine_slab.pkl: surface
# cell |a1| = 19.2463943 A for 5x1x1 -> a = sqrt(2)*|a1|/5). The tutorial
# slab was built at this constant, not the experimental 5.431 A.
SI111_TUTORIAL_A = 19.2463943 / 5.0 * float(np.sqrt(2.0))


def si111_sw(
    size=(5, 5),
    bilayers: int = 2,
    a: float = SI111_TUTORIAL_A,
    vacuum: float = 12.0,
    planar_distance: float = 1.2,
    surface_depth: int = 1,
    relax: RelaxConfig | None = None,
    relax_model: object = None,
    max_neighbors: int = 16,
    fast: bool = False,
    dtype=None,
) -> ExampleSystem:
    """Si(111) 5x5 slab with Stillinger-Weber — the reference's Si(111)
    5x5 tutorial system (tutorials/Si_111_5x5). Defaults reproduce the
    tutorial exactly: the 100-atom 5x5 x 2-bilayer primitive-cell slab
    (verified atom-for-atom against Si_111_5x5_pristine_slab.pkl to
    <1e-8 A modulo a rigid translation) with the bottom 75 atoms frozen
    (lammps_config.json ``bulk_index: 75`` / opt template ``group bulk
    id <= 75`` + ``setforce 0``).

    Acceptance energies are SW85 (Stillinger & Weber 1985) — exactly the
    tutorial's energy model (lammps_energy_template.txt:18 runs
    SW_StillingerWeber_1985, ``run 0``). The tutorial RELAXES under a
    different model, the SRS-1996 modified SW (lammps_opt_template.txt:18,
    KIM ThreeBodyCluster_SRS_StephensonRadnySmith_1996_Si); pass
    ``relax_model=`` an ``SWTables`` or a file path — a LAMMPS ``.sw``
    file OR the KIM model's ThreeBodyCluster parameter file itself
    (``potentials.sw.parse_kim_threebody`` reads the ``.params`` layout;
    the SRS constants are not redistributable here, so dropping the file
    is all that's left) — to enable that dual-potential split;
    relaxation then minimizes
    the relax model while acceptance stays on SW85 energies of the
    relaxed geometry.

    ``fast=True`` (rigid runs only) swaps in the precomputed occupancy-
    algebra SW (potentials/rigid_manybody.py; ~66x on TPU)."""
    import jax.numpy as jnp

    from surface_sampling_tpu.structure.slabs import diamond111

    slab = diamond111("Si", size=size, bilayers=bilayers, a=a, vacuum=vacuum)
    sites = find_adsorption_sites(slab, planar_distance=planar_distance)["all"]
    tables = sw_tables()
    spec = make_spec(
        slab,
        sites,
        ["Si"],
        potential_numbers=[Z_FROM_SYMBOL[e] for e in tables.elements],
        cutoff=tables.cutoff,
        surface_depth=surface_depth,
        surface_name="Si_111",
    )
    if fast and relax is None:
        from surface_sampling_tpu.potentials import make_sw_rigid

        pot = make_sw_rigid(tables, spec, dtype=dtype or jnp.float32)
    else:
        from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

        nbr = build_static_neighbor_table(
            spec, tables.cutoff, relax_slack=0.6 if relax is not None else 0.1
        )
        pot = make_sw(tables, max_neighbors=max_neighbors, dtype=dtype or jnp.float32,
                      static_nbr=nbr)
    relax_pot = None
    if relax_model is not None:
        from surface_sampling_tpu.potentials.sw import SWTables, load_sw_any

        # path: LAMMPS .sw or a KIM ThreeBodyCluster .params drop-in
        # (load_sw_any sniffs; parse_kim_threebody documents the layout)
        rt = relax_model if isinstance(relax_model, SWTables) else load_sw_any(relax_model)
        from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

        rnbr = build_static_neighbor_table(spec, rt.cutoff, relax_slack=0.6)
        relax_pot = make_sw(rt, max_neighbors=max_neighbors,
                            dtype=dtype or jnp.float32, static_nbr=rnbr)
    return ExampleSystem(
        spec, pot,
        MCMCRun(spec, pot, relax=relax, dtype=dtype or jnp.float32,
                relax_potential=relax_pot),
    )


def srtio3_001_painn(
    planar_distance: float = 1.5,
    surface_depth: int = 1,
    relax: RelaxConfig | None = None,
    chem_pots: dict | None = None,
    adsorbates: tuple[str, ...] = ("Sr", "Ti", "O"),
    n_models: int = 3,
    max_neighbors: int = 64,
    supercell: tuple[int, int] = (1, 1),
    pallas_routing: str | None = None,
    dtype=None,
) -> ExampleSystem:
    """SrTiO3(001) 2x2 slab with the reference's trained PaiNN ensemble —
    the flagship NN system (tutorials/SrTiO3_001.ipynb,
    scripts/configs/sample_config_painn.json: chem_pots Sr=-2 Ti=0 O=0,
    3-model ensemble, offset surface energy in atomic units).

    Slab geometry and model weights are converted from the reference's
    fixtures (systems_data/SrTiO3_001_2x2.npz, models/data/srtio3_painn_*).

    ``supercell=(a, b)`` tiles the pristine 2x2 slab in-plane — the
    production scaling axis (SURVEY §5.7: system size, not sequence
    length). The PaiNN edge search switches automatically between the
    dense one-hot MXU routing and the gather formulation by size
    (PaiNNConfig.message_mode="auto"). Note the nff stoidict offset
    carries a per-STRUCTURE intercept (linear-fit constant): absolute
    supercell energies are shifted by that constant relative to
    n-times-the-base value, but every MC energy DIFFERENCE — the
    quantity sampling uses — is exact; the NN part itself is extensive
    (tested).
    """
    import json as _json

    import jax.numpy as jnp

    from surface_sampling_tpu.core import make_offset_surface_energy
    from surface_sampling_tpu.models.convert_nff import load_params_npz
    from surface_sampling_tpu.models.ensemble import stack_params
    from surface_sampling_tpu.models.nn_calculator import make_painn_potential

    data = np.load(_DATA / "SrTiO3_001_2x2.npz")
    slab = Structure(data["numbers"], data["positions"], data["cell"])
    if tuple(supercell) != (1, 1):
        slab = slab.repeat((supercell[0], supercell[1], 1)).sorted_by_z()
    sites = find_adsorption_sites(
        slab, planar_distance=planar_distance, near_reduce=0.01, no_obtuse_hollow=True
    )["all"]
    offset_data = _json.loads((_DATA / "srtio3_offset_data.json").read_text())
    chem_pots = chem_pots or {"Sr": -2.0, "Ti": 0.0, "O": 0.0}

    import dataclasses as _dc

    model_dir = Path(__file__).parent / "models" / "data"
    plist, cfg = [], None
    for i in range(1, n_models + 1):
        p, cfg = load_params_npz(model_dir / f"srtio3_painn_{i:02d}.npz")
        plist.append(p)
    cfg = _dc.replace(cfg, max_neighbors=max_neighbors)
    if pallas_routing is not None:
        # "bf16" = single-pass pure-bf16 routing dots, the guarded
        # high-temperature speed opt-in (ops/pallas_routing.py); default
        # stays the near-f32 bf16x2 split
        cfg = _dc.replace(cfg, pallas_routing=pallas_routing)
    params = stack_params(plist) if n_models > 1 else plist[0]

    type_numbers = [Z_FROM_SYMBOL[s] for s in ("Sr", "Ti", "O")]
    spec = make_spec(
        slab,
        sites,
        list(adsorbates),
        potential_numbers=type_numbers,
        cutoff=cfg.cutoff,
        surface_depth=surface_depth,
        surface_name="SrTiO3_001",
    )
    from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

    slack = 0.6 if relax is not None else 0.1
    static_nbr = build_static_neighbor_table(spec, cfg.cutoff, relax_slack=slack)
    # supercells: block-banded routing in the fused kernel (the 1x1 cell
    # is laterally fully connected at this cutoff — band is None there)
    from surface_sampling_tpu.ops.banding import build_routing_band_for_spec

    routing_band = build_routing_band_for_spec(spec, static_nbr)
    pot = make_painn_potential(
        params,
        cfg,
        type_numbers,
        units="kcal/mol",
        ensemble=n_models > 1,
        stoidict=offset_data["stoidict"],
        static_nbr=static_nbr,
        routing_band=routing_band,
        spec=None if relax is not None else spec,
    )
    se_fn = make_offset_surface_energy(spec, chem_pots, offset_data, offset_units="atomic")
    if routing_band is not None and relax is None:
        # everything core.incremental.make_incremental_painn needs to build
        # the delta-evaluation (cached-feature) MC engine for this system
        pot.__dict__["inc_args"] = dict(
            spec=spec, params=params, cfg=cfg, static_nbr=static_nbr,
            band=routing_band, type_numbers=type_numbers, units="kcal/mol",
            stoidict=offset_data["stoidict"], surface_energy_fn=se_fn,
        )
    run = MCMCRun(spec, pot, surface_energy_fn=se_fn, relax=relax, dtype=dtype or jnp.float32)
    return ExampleSystem(spec, pot, run)


def lamno3_001_chgnet(
    planar_distance: float = 1.6,
    surface_depth: int = 1,
    adsorbates: tuple[str, ...] = ("O", "HO", "H2O"),
    chem_pots: dict | None = None,
    relax: RelaxConfig | None = None,
    max_neighbors: int = 96,
    supercell: tuple[int, int] = (1, 1),
    pallas_routing: str | None = None,
    dtype=None,
) -> ExampleSystem:
    """LaMnO3(001) 2x2x3 slab with the reference's fine-tuned CHGNet —
    the electrochemical (Pourbaix) sampling system (scripts/
    sample_pourbaix_surface.py, tutorials/data/LaMnO3_001: O/OH/H2O
    adsorption on the MnO2 termination under aqueous conditions).

    Geometry and weights converted from the reference's fixtures
    (systems_data/LaMnO3_001_2x2x3.npz, models/data/lamno3_chgnet.npz).
    The surface energy here is a plain chem-pot offset; for the full
    Pourbaix grand potential at (pH, phi) build the se_fn with
    pourbaix.make_pourbaix_surface_energy (see examples/07)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from surface_sampling_tpu.core.energy import make_chem_pot_surface_energy
    from surface_sampling_tpu.models.convert_chgnet import load_chgnet_npz
    from surface_sampling_tpu.models.nn_calculator import make_chgnet_potential

    data = np.load(_DATA / "LaMnO3_001_2x2x3.npz")
    slab = Structure(data["numbers"], data["positions"], data["cell"])
    if tuple(supercell) != (1, 1):
        # in-plane tiling — the production scaling axis, exactly as the
        # PaiNN flagship (srtio3_001_painn supercell semantics)
        slab = slab.repeat((supercell[0], supercell[1], 1)).sorted_by_z()
    sites = find_adsorption_sites(
        slab, planar_distance=planar_distance, near_reduce=0.01, no_obtuse_hollow=True
    )["all"]
    params, cfg = load_chgnet_npz(Path(__file__).parent / "models" / "data" / "lamno3_chgnet.npz")
    if max_neighbors != cfg.max_neighbors:
        cfg = _dc.replace(cfg, max_neighbors=max_neighbors)
    if pallas_routing is not None:
        cfg = _dc.replace(cfg, pallas_routing=pallas_routing)

    type_numbers = [Z_FROM_SYMBOL[s] for s in ("La", "Mn", "O", "H")]
    spec = make_spec(
        slab,
        sites,
        list(adsorbates),
        potential_numbers=type_numbers,
        cutoff=cfg.atom_graph_cutoff,
        surface_depth=surface_depth,
        surface_name="LaMnO3_001",
    )
    from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

    static_nbr = build_static_neighbor_table(
        spec, cfg.atom_graph_cutoff, relax_slack=0.6 if relax is not None else 0.1
    )
    # supercells: block-banded routing in the fused atom conv (rigid MC
    # only — the banded conv is forward-only, so relax-mode keeps the
    # full-width kernel whose VJP is fused too)
    routing_band = None
    if relax is None:
        from surface_sampling_tpu.ops.banding import build_routing_band_for_spec

        routing_band = build_routing_band_for_spec(spec, static_nbr)
    pot = make_chgnet_potential(params, cfg, type_numbers, units="eV",
                                static_nbr=static_nbr,
                                routing_band=routing_band)
    pot.__dict__["routing_banded"] = routing_band is not None
    chem_pots = chem_pots or {"O": -5.0, "H": -3.0}
    se_fn = make_chem_pot_surface_energy(spec, chem_pots)
    run = MCMCRun(spec, pot, surface_energy_fn=se_fn, relax=relax, dtype=dtype or jnp.float32)
    return ExampleSystem(spec, pot, run)


def au110_eam(relax: RelaxConfig | None = None, fast: bool = False,
              dtype=None) -> ExampleSystem:
    """Au(110) 2x2 canonical test system with the reference's exact geometry
    (tests/test_Au.py:31-44: 16-atom slab, 8 pre-identified sites,
    6 adsorbed Au atoms).

    ``fast=True`` (rigid runs only): the slab is rigid and single-species,
    so the exact-spline EAM collapses to the precomputed quadratic-form
    path (rho = W @ alive, E = 1/2 a^T Phi a — two small matmuls per
    evaluation with the f64 LAMMPS-exact tables baked in), lifting the
    ~350 ms/batch spline-gather cost to the Cu(100)-class rate. Agreement
    with the exact path is asserted in tests/test_regression_eam.py."""
    import jax.numpy as jnp

    data = np.load(_DATA / "Au_110_2x2.npz")
    slab = Structure(data["numbers"], data["slab_positions"], data["cell"])
    tables = builtin_eam("Au_u3")
    spec = make_spec(
        slab,
        data["ads_coords"],
        ["Au"],
        potential_numbers=tables.numbers,
        cutoff=tables.cutoff,
        surface_name="Au_110",
    )
    if fast and relax is None:
        from surface_sampling_tpu.potentials.eam import make_eam_rigid

        pot = make_eam_rigid(tables, spec, dtype=dtype or jnp.float32)
    else:
        pot = make_eam(tables, dtype=dtype or jnp.float32)
    return ExampleSystem(spec, pot, MCMCRun(spec, pot, relax=relax, dtype=dtype or jnp.float32))
