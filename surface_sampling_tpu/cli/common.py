"""Shared CLI runtime: settings, system assembly, the batched run driver.

The config schema mirrors the reference's three-section JSON
(system_settings / sampling_settings / calc_settings;
scripts/sample_surface.py:101-151, scripts/configs/*.json) with
additions: ``sampling_settings.n_chains`` batches independent chains on
the device, ``checkpoint_interval`` chunks the sweep scan for mid-run
durability, and every sampling driver takes ``--resume`` for exact
(bitwise) continuation.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from surface_sampling_tpu.cli.default_settings import DEFAULT_SAMPLING_SETTINGS
from surface_sampling_tpu.constants import Z_FROM_SYMBOL
from surface_sampling_tpu.core import (
    EngineConfig,
    MCMCRun,
    RelaxConfig,
    make_offset_surface_energy,
    make_spec,
)
from surface_sampling_tpu.structure import Structure, find_adsorption_sites
from surface_sampling_tpu.utils import create_anneal_schedule, setup_folders, setup_logger
from surface_sampling_tpu.utils.misc import load_structures_any


_PATH_KEYS = ("potential_file", "model_path", "offset_data",
              "phase_diagram", "pourbaix_diagram")


def load_settings(path: str | Path) -> dict:
    try:
        settings = json.loads(Path(path).read_text())
    except json.JSONDecodeError as e:
        raise SystemExit(f"error: settings file {path} is not valid JSON: {e}") from e
    if not isinstance(settings, dict):
        raise SystemExit(
            f"error: settings file {path} must contain a JSON object with "
            "system_settings / sampling_settings / calc_settings sections"
        )
    merged_sampling = {**DEFAULT_SAMPLING_SETTINGS, **settings.get("sampling_settings", {})}
    settings["sampling_settings"] = merged_sampling
    settings.setdefault("system_settings", {})
    settings.setdefault("calc_settings", {})
    # resolve relative file references against the settings file's directory
    # (not the process cwd — running the CLI from elsewhere must still work)
    base = Path(path).resolve().parent
    calc = settings["calc_settings"]

    def resolve(v):
        p = Path(v)
        if not p.is_absolute() and (base / p).exists():
            return str(base / p)
        return v

    for key in _PATH_KEYS:
        if isinstance(calc.get(key), str):
            calc[key] = resolve(calc[key])
    if isinstance(calc.get("files"), list):
        calc["files"] = [resolve(f) if isinstance(f, str) else f for f in calc["files"]]
    if isinstance(calc.get("model_paths"), list):
        calc["model_paths"] = [resolve(f) if isinstance(f, str) else f
                               for f in calc["model_paths"]]
    return settings


def load_slab(path: str | Path) -> Structure:
    sts = load_structures_any(path)
    if len(sts) != 1:
        raise ValueError(f"expected exactly one structure in {path}, got {len(sts)}")
    return sts[0]


def build_potential(calc_settings: dict, system_settings: dict):
    """Construct a Potential + its type->Z table from calc_settings.

    calc_name: eam | lj | morse | tersoff | sw | nff (PaiNN) | chgnet |
    mace (aka NffScaleMACE).
    EAM additionally exposes its tables via the returned potential's
    ``__dict__["tables"]`` so assemble_system can switch to the static-pair
    fast path once the spec geometry exists.
    """
    name = calc_settings.get("calc_name", "eam").lower()
    if name == "eam":
        from surface_sampling_tpu.potentials import load_tables_npz, make_eam
        from surface_sampling_tpu.potentials.eam import parse_funcfl, tables_from_funcfl

        files = calc_settings.get("files") or [calc_settings["potential_file"]]
        if str(files[0]).endswith(".npz"):
            tables = load_tables_npz(files[0])
        else:
            tables = tables_from_funcfl([parse_funcfl(f) for f in files])
        pot = make_eam(tables)
        pot.__dict__["tables"] = tables
        return pot, tables.numbers, tables.cutoff
    if name == "tersoff":
        from surface_sampling_tpu.potentials import make_tersoff
        from surface_sampling_tpu.potentials.tersoff import load_tersoff, load_tersoff_npz

        f = calc_settings["potential_file"]
        tables = load_tersoff_npz(f) if str(f).endswith(".npz") else load_tersoff(f)
        numbers = [Z_FROM_SYMBOL[e] for e in tables.elements]
        pot = make_tersoff(tables)
        pot.__dict__["manybody_tables"] = ("tersoff", tables)
        return pot, numbers, tables.cutoff
    if name == "sw":
        from surface_sampling_tpu.potentials import make_sw, sw_tables
        from surface_sampling_tpu.potentials.sw import load_sw

        f = calc_settings.get("potential_file")
        tables = load_sw(f) if f else sw_tables()
        numbers = [Z_FROM_SYMBOL[e] for e in tables.elements]
        pot = make_sw(tables)
        pot.__dict__["manybody_tables"] = ("sw", tables)
        return pot, numbers, tables.cutoff
    if name in ("nff", "painn"):
        from surface_sampling_tpu.models.convert_nff import load_params_npz
        from surface_sampling_tpu.models.ensemble import stack_params
        from surface_sampling_tpu.models.nn_calculator import make_painn_potential

        model_paths = calc_settings["model_paths"]
        plist, cfg = [], None
        for p in model_paths:
            params, cfg = load_params_npz(p)
            plist.append(params)
        params = stack_params(plist) if len(plist) > 1 else plist[0]
        if calc_settings.get("max_neighbors"):
            import dataclasses as _dc

            cfg = _dc.replace(cfg, max_neighbors=int(calc_settings["max_neighbors"]))
        elements = calc_settings["elements"]
        numbers = [Z_FROM_SYMBOL[e] for e in elements]
        offset_data = calc_settings.get("offset_data") or {}
        if isinstance(offset_data, str):
            offset_data = json.loads(Path(offset_data).read_text())
            calc_settings["offset_data"] = offset_data
        pot = make_painn_potential(
            params,
            cfg,
            numbers,
            units=calc_settings.get("model_units", "kcal/mol"),
            ensemble=len(plist) > 1,
            stoidict=offset_data.get("stoidict"),
        )
        return pot, numbers, cfg.cutoff
    if name == "chgnet":
        from surface_sampling_tpu.models.convert_chgnet import load_chgnet_npz
        from surface_sampling_tpu.models.nn_calculator import make_chgnet_potential

        params, cfg = load_chgnet_npz(calc_settings["model_path"])
        elements = calc_settings["elements"]
        numbers = [Z_FROM_SYMBOL[e] for e in elements]
        pot = make_chgnet_potential(params, cfg, numbers,
                                    units=calc_settings.get("model_units", "eV"))
        return pot, numbers, cfg.atom_graph_cutoff
    if name in ("mace", "nffscalemace"):
        # reference model_type "NffScaleMACE"; params come from an npz saved
        # by models.mace.save_mace_npz (trained in-framework — the reference
        # ships no MACE weights to port)
        from surface_sampling_tpu.models.mace import load_mace_npz, make_mace_potential

        params, cfg = load_mace_npz(calc_settings["model_path"])
        elements = calc_settings["elements"]
        numbers = [Z_FROM_SYMBOL[e] for e in elements]
        pot = make_mace_potential(params, cfg, numbers,
                                  units=calc_settings.get("model_units", "eV"))
        return pot, numbers, cfg.cutoff
    if name == "lj":
        from surface_sampling_tpu.potentials import make_lennard_jones

        p = calc_settings
        return (
            make_lennard_jones(p.get("epsilon", 1.0), p.get("sigma", 1.0), p.get("cutoff", 5.0)),
            [0],
            p.get("cutoff", 5.0),
        )
    if name == "morse":
        from surface_sampling_tpu.potentials import make_morse

        p = calc_settings
        return (
            make_morse(p.get("D", 1.0), p.get("alpha", 1.5), p.get("r0", 2.5),
                       p.get("cutoff", 6.0)),
            [0],
            p.get("cutoff", 6.0),
        )
    raise ValueError(f"unknown calc_name {name!r}")


@dataclass
class AssembledSystem:
    spec: object
    potential: object
    run: MCMCRun
    settings: dict


def assemble_system(settings: dict, slab: Structure, surface_energy_fn=None) -> AssembledSystem:
    sys_s = settings["system_settings"]
    calc_s = settings["calc_settings"]
    potential, numbers, pot_cutoff = build_potential(calc_s, sys_s)

    ads_coords = sys_s.get("ads_coords")
    if ads_coords is None:
        ads_coords = find_adsorption_sites(
            slab,
            planar_distance=sys_s.get("planar_distance", 2.0),
            near_reduce=sys_s.get("near_reduce", 0.01),
            no_obtuse_hollow=sys_s.get("no_obtuse_hollow", True),
            symm_reduce=sys_s.get("symm_reduce", False),
        )[sys_s.get("ads_site_type", "all")]
    ads_coords = np.asarray(ads_coords)

    adsorbates = settings["sampling_settings"].get("adsorbates") or list(
        calc_s.get("chem_pots", {}).keys()
    )
    spec = make_spec(
        slab,
        ads_coords,
        adsorbates,
        potential_numbers=numbers,
        cutoff=sys_s.get("cutoff", pot_cutoff),
        surface_depth=sys_s.get("surface_depth"),
        surface_name=sys_s.get("surface_name"),
        extra_elements=list(calc_s.get("chem_pots", {}).keys()) or None,
    )

    # default EAM runs onto the gather-free fast path (exact splines compile
    # pathologically slowly on the remote TPU compiler at large chain counts;
    # opt out with calc_settings {"fast": false})
    tables = getattr(potential, "__dict__", {}).get("tables")
    if tables is not None and calc_s.get("fast", True):
        from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
        from surface_sampling_tpu.potentials.eam import make_eam_static

        if calc_s.get("relax_atoms", False):
            nbr = build_static_neighbor_table(
                spec, sys_s.get("cutoff", pot_cutoff), relax_slack=0.6
            )
            potential = make_eam_static(tables, nbr, mode="cheb")
        else:
            # rigid MC: exact-spline quadratic forms (fastest AND exact);
            # group vocabularies fall back to the cheb candidate path
            from surface_sampling_tpu.potentials.eam import make_eam_rigid

            try:
                potential = make_eam_rigid(tables, spec)
            except ValueError:
                nbr = build_static_neighbor_table(
                    spec, sys_s.get("cutoff", pot_cutoff), relax_slack=0.05
                )
                potential = make_eam_static(tables, nbr, mode="cheb")

    # rigid (non-relaxed) Tersoff/SW MC runs onto the precomputed occupancy-
    # algebra path (105x / 66x measured; potentials/rigid_manybody.py);
    # group vocabularies or relax mode keep the dynamic geometry path
    manybody = getattr(potential, "__dict__", {}).get("manybody_tables")
    if (
        manybody is not None
        and calc_s.get("fast", True)
        and not calc_s.get("relax_atoms", False)
    ):
        kind, mb_tables = manybody
        from surface_sampling_tpu.potentials import make_sw_rigid, make_tersoff_rigid

        try:
            potential = (
                make_tersoff_rigid(mb_tables, spec)
                if kind == "tersoff"
                else make_sw_rigid(mb_tables, spec)
            )
        except ValueError as e:
            # group vocabulary or table-budget refusal
            # (rigid_manybody._check_rigid_budget): keep the dynamic path
            logging.getLogger("sst").info("rigid fast path skipped: %s", e)

    # NN potentials run onto the static-candidate edge path (skips the
    # all-image top_k neighbor search; ~2x faster MC evals); opt out with
    # calc_settings {"fast": false}. Each family left a rebuild hook
    # (<family>_args) because the spec didn't exist at build time.
    def _nn_builder(name):
        if name == "painn":
            from surface_sampling_tpu.models.nn_calculator import make_painn_potential
            return make_painn_potential
        if name == "chgnet":
            from surface_sampling_tpu.models.nn_calculator import make_chgnet_potential
            return make_chgnet_potential
        from surface_sampling_tpu.models.mace import make_mace_potential
        return make_mace_potential

    painn_nn_args = painn_static_nbr = None
    if calc_s.get("fast", True):
        for fam in ("painn", "chgnet", "mace"):
            nn_args = getattr(potential, "__dict__", {}).get(f"{fam}_args")
            if nn_args is None:
                continue
            from surface_sampling_tpu.core.static_neighbors import (
                build_static_neighbor_table,
            )

            cfg_nn = nn_args["cfg"]
            if calc_s.get("pallas_routing") and hasattr(cfg_nn, "pallas_routing"):
                # guarded speed opt-in: "bf16" = single-pass pure-bf16
                # routing dots (~2x the routing FLOPs at ~1e-2 eV error —
                # see ops/pallas_routing.py and docs/BENCHMARKS.md; fast
                # modes must over-reject, never under-reject: bf16 noise
                # is symmetric state-to-state, use only at high T)
                import dataclasses as _dc

                cfg_nn = _dc.replace(
                    cfg_nn, pallas_routing=str(calc_s["pallas_routing"]))
                nn_args = dict(nn_args, cfg=cfg_nn)
            cut = getattr(cfg_nn, "cutoff", None) or cfg_nn.atom_graph_cutoff
            slack = 0.6 if calc_s.get("relax_atoms", False) else 0.1
            nbr = build_static_neighbor_table(spec, cut, relax_slack=slack)
            if fam == "painn":
                # supercell fast path: block-banded routing in the fused
                # kernel whenever the geometry's candidate windows are
                # narrower than the cell (ops/banding.py; None otherwise)
                from surface_sampling_tpu.ops.banding import (
                    build_routing_band_for_spec,
                )

                nn_args = dict(
                    nn_args,
                    routing_band=build_routing_band_for_spec(spec, nbr),
                    # rigid static-edge fast path (ops/static_edges.py);
                    # only consumed on the non-relax evaluation path
                    spec=None if calc_s.get("relax_atoms", False) else spec,
                )
                painn_nn_args, painn_static_nbr = nn_args, nbr
            potential = _nn_builder(fam)(static_nbr=nbr, **nn_args)
            break

    if surface_energy_fn is None and calc_s.get("offset", False):
        offset_data = calc_s["offset_data"]
        if isinstance(offset_data, str):
            offset_data = json.loads(Path(offset_data).read_text())
            calc_s["offset_data"] = offset_data
        surface_energy_fn = make_offset_surface_energy(
            spec,
            calc_s.get("chem_pots", {}),
            offset_data,
            offset_units=calc_s.get("offset_units", "atomic"),
        )

    # delta-energy MC hook (core/incremental.py): rigid banded PaiNN
    # systems assembled through the CLI carry the same inc_args the
    # library path attaches (systems.srtio3_001_painn), making
    # sampling_settings.incremental=true available to run_sampling
    if (
        painn_nn_args is not None
        and painn_nn_args.get("routing_band") is not None
        and not calc_s.get("relax_atoms", False)
    ):
        potential.__dict__["inc_args"] = dict(
            spec=spec,
            params=painn_nn_args["params"],
            cfg=painn_nn_args["cfg"],
            static_nbr=painn_static_nbr,
            band=painn_nn_args["routing_band"],
            type_numbers=painn_nn_args["type_numbers"],
            units=painn_nn_args["units"],
            stoidict=painn_nn_args.get("stoidict"),
            surface_energy_fn=surface_energy_fn,
        )

    relax = None
    if calc_s.get("relax_atoms", False):
        relax = RelaxConfig(
            steps=calc_s.get("relax_steps", 20), fmax=calc_s.get("fmax", 0.01)
        )
        # warm-start ball-local relax hook (core/local_relax.py): with
        # sampling_settings.incremental=true a relaxing system runs the
        # reference's warm-started per-move optimize (dynamics.py:83)
        # restricted to the moved site's hop ball. Potential-agnostic —
        # only the spec's static candidate table is needed for the balls.
        if painn_static_nbr is not None:
            nbr_lr = painn_static_nbr
        else:
            from surface_sampling_tpu.core.static_neighbors import (
                build_static_neighbor_table,
            )

            nbr_lr = build_static_neighbor_table(
                spec, sys_s.get("cutoff", pot_cutoff), relax_slack=0.6)
        potential.__dict__["local_relax_args"] = dict(
            spec=spec, static_nbr=nbr_lr,
            hops=int(calc_s.get("relax_ball_hops", 1)), relax=relax,
            surface_energy_fn=surface_energy_fn,
            # descent policy: "exact" = warm-started ball FIRE with
            # full-cell forces (core/local_relax.py); "frozen_far_field" =
            # approximate ball descent against frozen far-field features
            # (core/ff_relax.py, PaiNN systems only) — acceptance energies
            # are full-cell in BOTH policies
            descent=str(calc_s.get("relax_descent", "exact")))
    run = MCMCRun(spec, potential, surface_energy_fn=surface_energy_fn, relax=relax)
    return AssembledSystem(spec, potential, run, settings)


def _se_vmem_opts(d, asys, samp) -> dict:
    """Scoped-VMEM compiler options for one-off state-energy jits in the
    CLI setup path (initial energies, canonical prep): big relax-banded
    programs exceed the 16 MB default scoped-vmem limit (measured 35 MB
    at 6x6 with relaxation) exactly like the main run jit, which already
    passes these options."""
    from surface_sampling_tpu.ops.pallas_painn import (
        scoped_vmem_compiler_options,
    )

    n_slots = int(d.pristine_positions.shape[0]
                  + d.site_coords.shape[0] * d.code_offsets.shape[1])
    return scoped_vmem_compiler_options(
        n_slots, relax_banded=getattr(asys.run, "relax", None) is not None)


def _truncate_stats(stats_path: Path, last_kept: int) -> None:
    """Drop stats.csv rows past ``last_kept`` (crash between a chunk's
    stats flush and its checkpoint leaves extra rows; resume removes
    them). Robust to empty/partially-written files: malformed rows and
    rows with unparsable leading fields are dropped too."""
    try:
        rows = stats_path.read_text().splitlines()
    except OSError:
        return
    if not rows:
        return
    kept = [rows[0]]
    for r in rows[1:]:
        try:
            if int(r.split(",", 1)[0]) <= last_kept:
                kept.append(r)
        except ValueError:
            pass   # truncated partial row from a crash mid-append
    stats_path.write_text("\n".join(kept) + "\n")


def even_prefill_states(spec, num_ads_atoms: int, n_chains: int, seed: int) -> np.ndarray:
    """Per-chain even-site prefill: every chain gets the same evenly spread
    site placement (Ward clustering of the site lattice is deterministic)
    but its OWN random species codes and tie-break top-ups, so chains start
    decorrelated in composition/arrangement exactly as the reference
    re-randomizes codes per run (mcmc/mcmc.py:163-179). Returns
    (n_chains, S) int32."""
    from surface_sampling_tpu.core.engine import even_site_prefill

    return np.stack([
        even_site_prefill(spec, num_ads_atoms,
                          rng=np.random.default_rng((seed, 1000 + c)))
        for c in range(n_chains)
    ])


def run_sampling(asys: AssembledSystem, run_folder: Path, seed: int = 0,
                 site_state0=None, resume=None) -> dict:
    """Execute the batched MCMC run + write the reference's artifacts:
    stats.csv, summary plot, per-chain best structures (CIF), checkpoint.

    ``resume``: path to a prior run's checkpoint.npz (or its run folder).
    Chain states — site occupancies, energies, relaxed positions, PRNG
    keys — and the sweep index are restored exactly, so the continued run
    is bitwise identical to the tail of an uninterrupted run over the
    same total schedule (the reference's ``starting_iteration``,
    mcmc/mcmc.py:313, made exact: JAX keys are part of the state).
    ``total_sweeps`` in the settings is the FULL target; only the
    remaining sweeps execute. When the run folder already holds a
    stats.csv (in-place resume), new rows are appended."""
    import jax
    import jax.numpy as jnp

    from surface_sampling_tpu.core import make_run_fn, prepare_canonical_fn
    from surface_sampling_tpu.core.state import realize_numbers
    from surface_sampling_tpu.io import load_checkpoint, save_checkpoint
    from surface_sampling_tpu.parallel import chain_states, make_chain_run
    from surface_sampling_tpu.structure.io import write_cif
    from surface_sampling_tpu.utils.plot import plot_summary_stats

    samp = asys.settings["sampling_settings"]
    logger = setup_logger("sst", run_folder / "mc.log")
    n_chains = int(samp.get("n_chains", 1))
    sweeps = int(samp["total_sweeps"])

    anneal = samp.get("anneal_schedule")
    if anneal is not None:
        temps = np.asarray(anneal, dtype=np.float64)
    elif samp.get("perform_annealing", True):
        temps = create_anneal_schedule(
            start_temp=samp["start_temp"],
            total_sweeps=sweeps,
            alpha=samp.get("alpha", 0.99),
            multiple_anneal=samp.get("multiple_anneal", False),
            save_folder=run_folder,
        )
        # optional floor: anneal down to t_min, then HOLD — the
        # production-statistics mode (geometric-to-zero freezes the
        # chain; sampling at a fixed final temperature is what makes
        # tau_int/ESS a statement about an ensemble). A floor at or
        # below the pre-extension final temperature leaves the earlier
        # schedule entries bitwise unchanged, so --resume extensions
        # remain exact continuations.
        if samp.get("t_min") is not None:
            temps = np.maximum(temps, float(samp["t_min"]))
    else:
        temps = np.repeat(samp["start_temp"], sweeps)

    cfg = EngineConfig(
        sweep_size=int(samp["sweep_size"]),
        canonical=bool(samp.get("canonical", False)),
        num_ads_atoms=int(samp.get("num_ads_atoms", 0)),
        # reference semantics: filter_distance>0 REPLACES Metropolis with
        # the pure geometric criterion (mcmc.py:253-261). An explicit
        # sampling_settings "criterion" overrides — notably
        # "metropolis_distance" (beyond-reference): Boltzmann sampling
        # under a hard-wall minimum-separation prior, the sane mode for
        # UNRELAXED NN sampling (sub-angstrom overlaps are NN
        # extrapolation territory; see core/events.py).
        criterion=samp.get("criterion") or ("testing" if samp.get("testing") else (
            "distance" if samp.get("filter_distance", 0) > 0 else "metropolis"
        )),
        filter_distance=float(samp.get("filter_distance", 0) or 1.5),
        record_positions=bool(samp.get("record_positions", True)),
        require_per_atom_energies=bool(samp.get("require_per_atom_energies", False)),
        require_distance_decay=bool(samp.get("require_distance_decay", False)),
        prep_max_steps=(
            int(samp["prep_max_steps"])
            if samp.get("prep_max_steps") is not None
            else None
        ),
        prep_force_fill=bool(samp.get("prep_force_fill", False)),
        mtm_trials=int(samp.get("mtm_trials", 0)),
    )
    dwm = None
    if cfg.require_distance_decay:
        from surface_sampling_tpu.utils.misc import compute_distance_weight_matrix

        dwm = compute_distance_weight_matrix(
            asys.spec.site_coords,
            float(samp.get("distance_decay_factor", 1.0)),
        )
    d = asys.run.d
    se_fn = asys.run.state_energy_fn

    start_sweep = 0
    if resume is not None:
        ckpt_path = Path(resume)
        if ckpt_path.is_dir():
            ckpt_path = ckpt_path / "checkpoint.npz"
        states, start_sweep, temps_prev, ckpt_extra = load_checkpoint(ckpt_path)
        got_chains = int(np.asarray(states.site_state).shape[0])
        if got_chains != n_chains:
            raise ValueError(
                f"checkpoint has {got_chains} chains but settings ask for "
                f"{n_chains}; set sampling_settings.n_chains={got_chains}"
            )
        if samp.get("tempering", False):
            if "swap_key" not in ckpt_extra:
                raise ValueError(
                    "checkpoint has no swap_key: it was not written by a "
                    "tempering run (or predates tempering resume)"
                )
        elif samp.get("population_annealing", False):
            if "pa_key" not in ckpt_extra:
                raise ValueError(
                    "checkpoint has no pa_key: it was not written by a "
                    "population-annealing run"
                )
            n_prev = min(start_sweep, len(temps_prev), len(temps))
            if not np.allclose(temps[:n_prev], temps_prev[:n_prev],
                               rtol=1e-9, atol=1e-12):
                raise ValueError(
                    "temperature schedule mismatch: the first "
                    f"{n_prev} sweeps of the new schedule differ from the "
                    "checkpointed run — resume requires the same settings"
                )
        else:
            n_prev = min(start_sweep, len(temps_prev), len(temps))
            if not np.allclose(temps[:n_prev], temps_prev[:n_prev],
                               rtol=1e-9, atol=1e-12):
                raise ValueError(
                    "temperature schedule mismatch: the first "
                    f"{n_prev} sweeps of the new schedule differ from the "
                    "checkpointed run — resume requires the same settings"
                )
        if start_sweep >= sweeps:
            raise ValueError(
                f"checkpoint already completed {start_sweep} sweeps; "
                f"raise total_sweeps (currently {sweeps}) to continue"
            )
        logger.info("Resuming from %s at sweep %d/%d", ckpt_path, start_sweep, sweeps)
    else:
        states = chain_states(d, jax.random.PRNGKey(seed), n_chains,
                              site_state=site_state0)
        e0 = jax.jit(jax.vmap(lambda ss: se_fn(ss).surface_energy),
                     compiler_options=_se_vmem_opts(d, asys, samp)
                     )(states.site_state)
        states = states._replace(energy=e0)
    if resume is None and cfg.canonical and cfg.num_ads_atoms > 0:
        if samp.get("even_adsorption_sites", False):
            ss0 = even_prefill_states(asys.spec, cfg.num_ads_atoms, n_chains, seed)
            states = chain_states(d, jax.random.PRNGKey(seed), n_chains, site_state=ss0)
        else:
            prep = jax.jit(jax.vmap(
                prepare_canonical_fn(
                    d, se_fn, cfg.num_ads_atoms, cfg,
                    max_steps=cfg.prep_max_steps,
                    force_fill=cfg.prep_force_fill,
                ),
                in_axes=(0, None),
            ))
            states = prep(states, jnp.asarray(float(temps[0])))
        e0 = jax.jit(jax.vmap(lambda ss: se_fn(ss).surface_energy),
                     compiler_options=_se_vmem_opts(d, asys, samp)
                     )(states.site_state)
        states = states._replace(energy=e0)

    if samp.get("tempering", False) and samp.get("population_annealing", False):
        raise ValueError(
            "tempering=true and population_annealing=true are mutually "
            "exclusive sampling modes — pick one"
        )
    if samp.get("incremental", False) and samp.get("population_annealing", False):
        # tempering composes (the swap phase gathers the feature caches
        # with the configurations — see _run_tempered); PA does not YET:
        # its resampler replicates chains by importance weight, and
        # replicating the multi-GB cache pytree inside the resample select
        # doubles peak HBM at exactly the supercell sizes the incremental
        # engine targets. Not a mathematical obstruction — a memory one;
        # run PA on the full-evaluation path.
        raise ValueError(
            "incremental=true does not compose with population_annealing "
            "(the resampler would replicate the per-chain feature caches; "
            "peak-memory prohibitive at supercell sizes) — drop one; "
            "incremental+tempering IS supported"
        )
    if samp.get("population_annealing", False):
        if cfg.mtm_trials > 1:
            raise ValueError(
                "mtm_trials is not supported with population_annealing=true: "
                "the PA runner builds single-try steps — drop one of the two "
                "settings"
            )
        return _run_population_annealing(
            asys, run_folder, states, temps, cfg, samp, logger, seed,
            start_sweep=start_sweep,
            pa_key=(None if resume is None else ckpt_extra.get("pa_key")),
            prev_temps=(None if resume is None else temps_prev),
        )
    if samp.get("tempering", False):
        if cfg.mtm_trials > 1:
            raise ValueError(
                "mtm_trials is not supported with tempering=true: the "
                "replica-exchange runner builds single-try steps — drop one "
                "of the two settings"
            )
        return _run_tempered(
            asys, run_folder, states, temps, cfg, samp, logger, seed,
            start_round=start_sweep,
            swap_key=(None if resume is None else ckpt_extra["swap_key"]),
            prev_ladder=(None if resume is None else temps_prev),
        )

    temps_seg = np.asarray(temps)[start_sweep:sweeps]
    n_seg = len(temps_seg)
    if samp.get("incremental", False) and getattr(asys.run, "relax", None) is not None:
        # relax-mode locality (core/local_relax.py): warm-started ball-
        # local FIRE — the reference's per-move in-place optimize
        # (dynamics.py:83) restricted to the moved site's hop ball, with
        # the relaxed geometry carried as chain state. MCState/SweepRecord
        # schema unchanged, so chunking / checkpoint / --resume stay
        # bitwise (positions ARE checkpoint state).
        lr_args = getattr(asys.potential, "__dict__", {}).get("local_relax_args")
        if lr_args is None:
            raise ValueError(
                "sampling_settings.incremental=true with relax_atoms needs "
                "the local_relax_args hook (assembled CLI systems attach it "
                "whenever relax_atoms is on)"
            )
        if cfg.mtm_trials > 1:
            raise ValueError(
                "incremental=true builds single-try steps — drop mtm_trials")
        if cfg.criterion not in ("metropolis", "metropolis_distance"):
            raise ValueError(
                "incremental=true supports the metropolis and "
                f"metropolis_distance criteria (got {cfg.criterion!r})"
            )
        if cfg.require_per_atom_energies or cfg.require_distance_decay:
            raise ValueError(
                "incremental=true uses the symmetric unweighted proposals "
                "— drop require_per_atom_energies/require_distance_decay"
            )
        descent = lr_args.get("descent", "exact")
        if descent in ("frozen_far_field", "ff"):
            # approximate-descent variant (core/ff_relax.py): the per-move
            # FIRE descends a compact ball subproblem against frozen
            # far-field features; acceptance stays a full-cell evaluation.
            # Checkpoints keep the MCState schema (caches rebuilt at chunk
            # boundaries), so chunking / --resume semantics are unchanged.
            if getattr(asys.potential, "__dict__", {}).get("ff_pack") is None:
                raise ValueError(
                    "relax_descent='frozen_far_field' needs a PaiNN-family "
                    "potential (this calculator carries no ff_pack hook)")
            from surface_sampling_tpu.core.ff_relax import (
                build_ff_tables,
                make_ff_canonical_step,
                make_ff_relax_eval,
                make_ff_run_mcstate,
                make_ff_semigrand_step,
            )

            tables = build_ff_tables(lr_args["spec"], lr_args["static_nbr"],
                                     hops=lr_args["hops"])
            # seat phase measured cost-neutral-to-negative on the flagship
            # (docs/BENCHMARKS.md) — available via relax_seat=true for
            # systems where the fresh-adsorbate budget dominates
            seat_tables = (
                build_ff_tables(lr_args["spec"], lr_args["static_nbr"],
                                hops=0)
                if asys.settings["calc_settings"].get("relax_seat", False)
                else None)
            evaluate = make_ff_relax_eval(
                d, asys.potential,
                surface_energy_fn=lr_args["surface_energy_fn"],
                relax=lr_args["relax"], tables=tables,
                seat_tables=seat_tables)
            _mk_ff = (make_ff_canonical_step if cfg.canonical
                      else make_ff_semigrand_step)
            ff_step = _mk_ff(d, evaluate, criterion=cfg.criterion,
                             filter_distance=cfg.filter_distance)
            run_fn = make_ff_run_mcstate(
                evaluate, ff_step, cfg.sweep_size,
                record_positions=cfg.record_positions)
            logger.info(
                "frozen-far-field ball relax MC engine active (hops=%d, "
                "ball=%d/%d rows, ball_frac=%.3f)", lr_args["hops"],
                tables.n_ball, tables.n_sub, tables.ball_frac)
        elif descent != "exact":
            raise ValueError(
                f"unknown calc_settings.relax_descent {descent!r} "
                "(expected 'exact' or 'frozen_far_field')")
        else:
            from surface_sampling_tpu.core.local_relax import (
                build_ball_masks,
                make_local_relax_canonical_step,
                make_local_relax_eval,
                make_local_relax_run,
                make_local_relax_semigrand_step,
            )

            balls = build_ball_masks(lr_args["spec"], lr_args["static_nbr"],
                                     hops=lr_args["hops"])
            evaluate = make_local_relax_eval(
                d, asys.potential,
                surface_energy_fn=lr_args["surface_energy_fn"],
                relax=lr_args["relax"], ball_masks=balls)
            _mk_lr = (make_local_relax_canonical_step if cfg.canonical
                      else make_local_relax_semigrand_step)
            lr_step = _mk_lr(d, evaluate, criterion=cfg.criterion,
                             filter_distance=cfg.filter_distance)
            run_fn = make_local_relax_run(
                lr_step, cfg.sweep_size,
                record_positions=cfg.record_positions)
            logger.info("warm-started ball-local relax MC engine active "
                        "(hops=%d)", lr_args["hops"])
    elif samp.get("incremental", False):
        # delta-energy locality (core/incremental.py): each MC move
        # recomputes only the changed site's hop balls against per-layer
        # feature caches — the supercell fast path. Caches are rebuilt
        # from the occupancy at every chunk boundary (one full evaluation
        # per chain), so a chunk stays a pure function of (carry, temps)
        # and chunking / checkpoint / --resume semantics are unchanged.
        inc_args = getattr(asys.potential, "__dict__", {}).get("inc_args")
        if inc_args is None:
            raise ValueError(
                "sampling_settings.incremental=true needs a rigid banded "
                "PaiNN assembly (supercell geometry wide enough to band, "
                "calc_settings fast path on, relax_atoms off) — this "
                "system carries no inc_args hook"
            )
        if cfg.mtm_trials > 1:
            raise ValueError(
                "incremental=true builds single-try steps — drop mtm_trials")
        if cfg.criterion not in ("metropolis", "metropolis_distance"):
            raise ValueError(
                "incremental=true supports the metropolis and "
                f"metropolis_distance criteria (got {cfg.criterion!r})"
            )
        if cfg.require_per_atom_energies or cfg.require_distance_decay:
            raise ValueError(
                "incremental=true uses the symmetric unweighted proposals "
                "— drop require_per_atom_energies/require_distance_decay"
            )
        from dataclasses import replace as _dc_replace

        from surface_sampling_tpu.core.engine import SweepRecord
        from surface_sampling_tpu.core.incremental import (
            make_incremental_canonical_step,
            make_incremental_painn,
            make_incremental_run,
            make_incremental_semigrand_step,
        )

        # positions realize from the occupancy on export (rigid lattice)
        cfg = _dc_replace(cfg, record_positions=False)
        engine = make_incremental_painn(d=d, **inc_args)
        _mk_step = (make_incremental_canonical_step if cfg.canonical
                    else make_incremental_semigrand_step)
        inc_step = _mk_step(engine, d=d, criterion=cfg.criterion,
                            filter_distance=cfg.filter_distance)
        inc_run = make_incremental_run(inc_step, cfg.sweep_size)

        def run_fn(state, temps_c):
            inc0 = engine.init_state(state.key, state.site_state)
            inc1, rec = inc_run(inc0, temps_c)
            out = state._replace(
                site_state=inc1.site_state, energy=inc1.energy, key=inc1.key
            )
            return out, SweepRecord(
                site_state=rec.site_state,
                energy=rec.energy,
                accept_rate=rec.accept_rate,
                n_ads=rec.n_ads,
                positions=jnp.zeros(
                    (temps_c.shape[0], 0, 3), state.relaxed_positions.dtype
                ),
                oob_rate=rec.oob_rate,
            )

        logger.info("incremental (delta-energy) MC engine active")
    else:
        run_fn = make_run_fn(d, se_fn, cfg, potential=asys.potential,
                             distance_weight_matrix=dwm)
    from surface_sampling_tpu.ops.pallas_painn import (
        scoped_vmem_compiler_options,
    )

    n_slots = int(d.pristine_positions.shape[0]
                  + d.site_coords.shape[0] * d.code_offsets.shape[1])
    # local-relax programs differentiate the banded kernel inside FIRE —
    # their scoped-VMEM frame outgrows the 16 MB default much earlier
    # (measured 18.42 MB at 496 slots; see scoped_vmem_compiler_options)
    lr_active = (samp.get("incremental", False)
                 and getattr(asys.run, "relax", None) is not None)
    crun = make_chain_run(
        run_fn, compiler_options=scoped_vmem_compiler_options(
            n_slots, relax_banded=lr_active))
    logger.info(
        "Running %d chains x %d sweeps x %d steps on %s",
        n_chains, n_seg, cfg.sweep_size, jax.devices()[0].platform,
    )
    from surface_sampling_tpu.utils.tracing import PhaseTimer, block_and_time

    # mid-run durability: with sampling_settings.checkpoint_interval = k,
    # the sweep scan executes in k-sweep chunks and checkpoint.npz is
    # rewritten after each chunk — a killed long run loses at most k
    # sweeps and --resume continues from the last completed chunk.
    # Chunking is bitwise-neutral: the chain states carried across chunk
    # boundaries are exactly the scan carry (tested in test_cli).
    ckpt_every = int(samp.get("checkpoint_interval", 0) or 0)
    if not 0 < ckpt_every < n_seg:
        chunk_bounds = [(0, n_seg)]
    else:
        chunk_bounds = [(lo, min(lo + ckpt_every, n_seg))
                        for lo in range(0, n_seg, ckpt_every)]

    # stats.csv rows flush per chunk (live progress for long runs);
    # in-place resume appends to the previous run's rows
    header = "sweep,temp,energy_mean,energy_min,accept_rate,n_ads_mean,oob_rate"
    stats_path = run_folder / "stats.csv"
    if not (start_sweep > 0 and stats_path.exists()):
        stats_path.write_text(header + "\n")
    else:
        # a crash between a chunk's stats flush and its checkpoint cannot
        # leave duplicate rows
        _truncate_stats(stats_path, start_sweep)

    def flush_stats(lo, hi, recs):
        e = np.asarray(recs.energy)
        acc = np.asarray(recs.accept_rate)
        na = np.asarray(recs.n_ads)
        ob = np.asarray(recs.oob_rate)
        rows = []
        for i in range(hi - lo):
            g = lo + i
            rows.append(
                f"{start_sweep + g + 1},{temps_seg[g]:.6f},"
                f"{e[:, i].mean():.6f},{e[:, i].min():.6f},"
                f"{acc[:, i].mean():.4f},{na[:, i].mean():.3f},{ob[:, i].mean():.4f}"
            )
        with stats_path.open("a") as f:
            f.write("\n".join(rows) + "\n")

    # elastic recovery: the remote-TPU path can kill a long device-program
    # execution with a transient `UNAVAILABLE: TPU device error` (the tunnel
    # recovers on its own). With chunk_retries = r (default 1) a failed chunk
    # is re-executed up to r times from a host-side snapshot of the scan
    # carry — bitwise identical to an undisturbed run, since the chunk is a
    # pure function of (carry states, temps). Set 0 to fail fast.
    chunk_retries = int(samp.get("chunk_retries", 1))

    def run_chunk(states, lo, hi):
        host_states = jax.device_get(states) if chunk_retries > 0 else None
        for attempt in range(chunk_retries + 1):
            try:
                out_states, recs = crun(
                    states, jnp.asarray(temps_seg[lo:hi], jnp.float32))
                jax.block_until_ready(recs.energy)
                return out_states, recs
            except jax.errors.JaxRuntimeError:
                if attempt >= chunk_retries:
                    raise
                logger.warning(
                    "device error in sweeps %d-%d; retrying (%d/%d)",
                    start_sweep + lo + 1, start_sweep + hi,
                    attempt + 1, chunk_retries,
                )
                states = jax.tree.map(jnp.asarray, host_states)

    timer = PhaseTimer()
    rec_parts = []
    for ci, (lo, hi) in enumerate(chunk_bounds):
        # the first chunk carries the one-time jit; later chunks reuse it
        with timer.phase("compile+first_chunk" if ci == 0 else "mc_chunks"):
            out_states, recs = run_chunk(states, lo, hi)
        states = out_states
        rec_parts.append(recs)
        # stats flush BEFORE the checkpoint: a crash in between leaves
        # extra stats rows past the checkpoint, which the resume path
        # truncates (the reverse order would leave permanent gaps)
        flush_stats(lo, hi, recs)
        if len(chunk_bounds) > 1:
            save_checkpoint(run_folder / "checkpoint.npz", out_states,
                            start_sweep + hi, np.asarray(temps))
            logger.info("checkpoint at sweep %d/%d", start_sweep + hi, sweeps)

    def _cat(field):
        return np.concatenate([np.asarray(getattr(r, field)) for r in rec_parts],
                              axis=1)

    energy = _cat("energy")                       # (chains, n_seg)
    accept = _cat("accept_rate")
    n_ads = _cat("n_ads")
    oob = _cat("oob_rate")
    if oob.mean() > 0:
        logger.warning("%.2f%% of trial moves hit the OOB energy clamp",
                       100 * oob.mean())

    # sampling-quality summary: per-chain integrated autocorrelation time
    # of the energy series + pooled effective sample size (the diagnostics
    # analysis/statistics.py provides; the reference reports neither)
    if n_seg >= 8:
        from surface_sampling_tpu.analysis.statistics import (
            integrated_autocorrelation_time,
        )

        probe = range(min(n_chains, 16))
        tau = float(np.mean([integrated_autocorrelation_time(energy[c]) for c in probe]))
        # pooled ESS = N_total / tau_mean — consistent with the reported
        # tau by construction. The per-chain-sum alternative
        # (sum_c n/tau_c) inflates arbitrarily when chains freeze at low
        # temperature: a (near-)constant energy series defeats the ACF
        # estimator (tau -> 1, "ESS" -> n for a chain holding ONE state —
        # measured on the 2x2 hold-T campaign: 9 of 32 frozen chains
        # turned ESS 504 into 15,724). When all chains mix, the two
        # formulas agree (round-4 campaign: 130 vs 128).
        ess = float(n_chains * energy.shape[1] / max(tau, 1.0))
        logger.info("sampling quality: tau_int=%.2f sweeps, pooled ESS=%.0f", tau, ess)
        (run_folder / "sampling_quality.json").write_text(
            json.dumps({"tau_int_sweeps": tau, "pooled_ess": ess,
                        "n_chains": n_chains, "sweeps": n_seg})
        )

    plot_summary_stats(
        energy.mean(axis=0), accept.mean(axis=0), n_ads.mean(axis=0), n_seg,
        save_folder=run_folder,
    )

    # best structure over all chains/sweeps of this segment
    flat = energy.reshape(-1)
    best = int(np.argmin(flat))
    bc, bs = divmod(best, n_seg)
    site_state_all = _cat("site_state")
    ss_best = site_state_all[bc, bs]
    numbers = np.asarray(realize_numbers(d, jnp.asarray(ss_best)))
    if cfg.record_positions:
        pos = _cat("positions")[bc, bs]
    else:
        from surface_sampling_tpu.core.state import realize_positions

        pos = np.asarray(realize_positions(d, jnp.asarray(ss_best)))
    keep = numbers > 0
    best_st = Structure(numbers[keep], pos[keep], asys.spec.cell)
    write_cif(run_folder / f"best_energy_{flat[best]:.3f}.cif", best_st)

    save_checkpoint(run_folder / "checkpoint.npz", out_states, sweeps,
                    np.asarray(temps))
    np.savez_compressed(
        run_folder / "history.npz",
        site_state=site_state_all,
        energy=energy,
        accept_rate=accept,
        n_ads=n_ads,
        temps=temps_seg,
        start_sweep=np.asarray(start_sweep),
    )

    # per-sweep structure export (reference SurfaceSystem.save_structures,
    # mcmc/system.py:488-534: one structure per sweep). Multi-chain modes:
    # "best" = per-sweep minimum-energy structure across chains,
    # "chain0" = chain 0's trajectory (closest to the reference's single
    # chain). Fixed-composition runs stream through the native multi-frame
    # XYZ writer (runtime/native.write_xyz_frames).
    save_mode = str(samp.get("save_structures", "none")).lower()
    if save_mode in ("best", "chain0"):
        frames_num, frames_pos = [], []
        pos_all = _cat("positions") if cfg.record_positions else None
        for i in range(n_seg):
            c = int(np.argmin(energy[:, i])) if save_mode == "best" else 0
            ssf = jnp.asarray(site_state_all[c, i])
            nums = np.asarray(realize_numbers(d, ssf))
            if pos_all is not None:
                posf = pos_all[c, i]
            else:
                from surface_sampling_tpu.core.state import realize_positions

                posf = np.asarray(realize_positions(d, ssf))
            keepf = nums > 0
            frames_num.append(nums[keepf])
            frames_pos.append(posf[keepf])
        counts = {len(n_) for n_ in frames_num}
        traj_path = run_folder / f"traj_{save_mode}.xyz"
        if len(counts) == 1:
            from surface_sampling_tpu.runtime.native import write_xyz_frames

            write_xyz_frames(traj_path, frames_num[0],
                             np.stack(frames_pos), asys.spec.cell)
        else:
            # variable composition (semigrand): frame-by-frame python path
            from surface_sampling_tpu.constants import SYMBOL_FROM_Z

            cellstr = " ".join(f"{x:.8f}" for x in asys.spec.cell.flatten())
            with traj_path.open("w") as f:
                for k, (nums, posf) in enumerate(zip(frames_num, frames_pos)):
                    f.write(f"{len(nums)}\n")
                    f.write(f'Lattice="{cellstr}" '
                            f"Properties=species:S:1:pos:R:3 "
                            f"sweep={start_sweep + k + 1}\n")
                    for z, pz in zip(nums, posf):
                        f.write(f"{SYMBOL_FROM_Z[int(z)]} "
                                f"{pz[0]:.8f} {pz[1]:.8f} {pz[2]:.8f}\n")
        logger.info("wrote %d per-sweep structures -> %s", n_seg, traj_path.name)

    logger.info("Best surface energy %.4f eV (chain %d sweep %d)",
                flat[best], bc, start_sweep + bs + 1)
    logger.info("Timing: %s", timer.report().replace("\n", " | "))
    return {
        "energy_hist": energy,
        "frac_accept_hist": accept,
        "adsorption_count_hist": n_ads,
        "best_energy": float(flat[best]),
        "run_folder": run_folder,
    }


def _run_tempered(asys, run_folder, states, temps, cfg, samp, logger, seed,
                  start_round: int = 0, swap_key=None, prev_ladder=None):
    """Replica-exchange variant of run_sampling: chains become a temperature
    ladder; one swap phase per sweep (parallel/tempering.py).

    Resume: ``start_round``/``swap_key``/``prev_ladder`` come from a prior
    checkpoint — the swap key and round counter continue the exact swap
    sequence, so the continuation is bitwise identical to an
    uninterrupted run over len(temps) rounds."""
    import jax
    import jax.numpy as jnp

    from surface_sampling_tpu.core import make_sweep_fn
    from surface_sampling_tpu.core.events import make_canonical_step, make_semigrand_step
    from surface_sampling_tpu.io import save_checkpoint
    from surface_sampling_tpu.parallel import make_tempered_run, temperature_ladder
    from surface_sampling_tpu.utils.plot import plot_energy_analysis

    d = asys.run.d
    se_fn = asys.run.state_energy_fn
    n_chains = int(np.asarray(states.site_state).shape[0])
    t_min = float(samp.get("t_min", min(temps)))
    t_max = float(samp.get("t_max", max(temps)))
    ladder = jnp.asarray(temperature_ladder(t_min, t_max, n_chains), jnp.float32)
    if prev_ladder is not None and not np.allclose(
            np.asarray(ladder), np.asarray(prev_ladder, np.float32),
            rtol=1e-6, atol=1e-7):
        raise ValueError(
            "temperature ladder mismatch: resumed tempering needs the same "
            "t_min/t_max/n_chains as the checkpointed run"
        )
    inc_engine = None
    if samp.get("incremental", False) and getattr(asys.run, "relax", None) is not None:
        # relax-mode locality (core/local_relax.py) composes with
        # tempering directly: the step is MCState-based and the swap
        # phase's pytree-wide gather carries the relaxed geometry with
        # the configuration it belongs to.
        lr_args = getattr(asys.potential, "__dict__", {}).get("local_relax_args")
        if lr_args is None:
            raise ValueError(
                "sampling_settings.incremental=true with relax_atoms needs "
                "the local_relax_args hook (assembled CLI systems attach it "
                "whenever relax_atoms is on)"
            )
        if cfg.mtm_trials > 1:
            raise ValueError(
                "incremental=true builds single-try steps — drop mtm_trials")
        if cfg.criterion not in ("metropolis", "metropolis_distance"):
            raise ValueError(
                "incremental=true supports the metropolis and "
                f"metropolis_distance criteria (got {cfg.criterion!r})"
            )
        if lr_args.get("descent", "exact") in ("frozen_far_field", "ff"):
            raise ValueError(
                "relax_descent='frozen_far_field' does not compose with "
                "tempering yet: the replica rounds drive MCState sweeps "
                "directly, while the ff engine carries per-chain feature "
                "caches whose per-round rebuild (one full collect pass per "
                "replica per round) would dominate short tempering rounds "
                "— run tempering with the exact descent, or ff without "
                "tempering")
        from surface_sampling_tpu.core.local_relax import (
            build_ball_masks,
            make_local_relax_canonical_step,
            make_local_relax_eval,
            make_local_relax_semigrand_step,
        )

        balls = build_ball_masks(lr_args["spec"], lr_args["static_nbr"],
                                 hops=lr_args["hops"])
        evaluate = make_local_relax_eval(
            d, asys.potential,
            surface_energy_fn=lr_args["surface_energy_fn"],
            relax=lr_args["relax"], ball_masks=balls)
        _mk_lr = (make_local_relax_canonical_step if cfg.canonical
                  else make_local_relax_semigrand_step)
        lr_step = _mk_lr(d, evaluate, criterion=cfg.criterion,
                         filter_distance=cfg.filter_distance)
        sweep = make_sweep_fn(lr_step, cfg.sweep_size)
        logger.info("ball-local relax tempered replicas active (hops=%d)",
                    lr_args["hops"])
    elif samp.get("incremental", False):
        # incremental (delta-energy) replicas: nothing in the delta math
        # depends on temperature, so tempering composes by carrying the
        # feature caches through the rounds and letting the swap phase
        # gather them along with the configuration they describe
        # (parallel/tempering.py::_swap_phase is pytree-generic). Caches
        # are rebuilt from the occupancy at every chunk boundary, exactly
        # like the plain incremental path, so chunking / checkpoint /
        # --resume semantics are unchanged.
        inc_args = getattr(asys.potential, "__dict__", {}).get("inc_args")
        if inc_args is None:
            raise ValueError(
                "sampling_settings.incremental=true needs a rigid banded "
                "PaiNN assembly (supercell geometry wide enough to band, "
                "calc_settings fast path on, relax_atoms off) — this "
                "system carries no inc_args hook"
            )
        if cfg.mtm_trials > 1:
            raise ValueError(
                "incremental=true builds single-try steps — drop mtm_trials")
        if cfg.criterion not in ("metropolis", "metropolis_distance"):
            raise ValueError(
                "incremental=true supports the metropolis and "
                f"metropolis_distance criteria (got {cfg.criterion!r})"
            )
        if cfg.require_per_atom_energies or cfg.require_distance_decay:
            raise ValueError(
                "incremental=true uses the symmetric unweighted proposals "
                "— drop require_per_atom_energies/require_distance_decay"
            )
        from surface_sampling_tpu.core.incremental import (
            make_incremental_canonical_step,
            make_incremental_painn,
            make_incremental_semigrand_step,
        )

        inc_engine = make_incremental_painn(d=d, **inc_args)
        _mk_step = (make_incremental_canonical_step if cfg.canonical
                    else make_incremental_semigrand_step)
        inc_step = _mk_step(inc_engine, d=d, criterion=cfg.criterion,
                            filter_distance=cfg.filter_distance)

        # sweep over IncState (structurally make_incremental_run's inner
        # sweep); the tempered runner vmaps it over the replica axis and
        # its swap phase gathers the caches along the chain axis
        def sweep(state, temp):
            def body(st, _):
                st, info = inc_step(st, temp)
                return st, info

            return jax.lax.scan(body, state, None, length=cfg.sweep_size)

        logger.info("incremental (delta-energy) tempered replicas active")
    elif cfg.canonical:
        step_fn = make_canonical_step(d, se_fn, criterion=cfg.criterion,
                                      filter_distance=cfg.filter_distance)
        sweep = make_sweep_fn(step_fn, cfg.sweep_size)
    else:
        step_fn = make_semigrand_step(d, se_fn, criterion=cfg.criterion,
                                      filter_distance=cfg.filter_distance)
        sweep = make_sweep_fn(step_fn, cfg.sweep_size)
    n_rounds = len(temps)
    if start_round >= n_rounds:
        raise ValueError(
            f"checkpoint already completed {start_round} rounds; raise "
            f"total_sweeps (currently {n_rounds}) to continue"
        )
    n_seg = n_rounds - start_round
    logger.info("Tempering: %d replicas, ladder %.3f -> %.3f, rounds %d-%d",
                n_chains, t_max, t_min, start_round + 1, n_rounds)
    key = (jnp.asarray(swap_key, jnp.uint32) if swap_key is not None
           else jax.random.PRNGKey(seed + 1))

    # mid-run durability (checkpoint_interval), mirroring run_sampling:
    # each chunk carries (states, swap key) exactly, so chunking is
    # bitwise-neutral; checkpoint.npz updates after every chunk
    ckpt_every = int(samp.get("checkpoint_interval", 0) or 0)
    if not 0 < ckpt_every < n_seg:
        chunk_bounds = [(0, n_seg)]
    else:
        chunk_bounds = [(lo, min(lo + ckpt_every, n_seg))
                        for lo in range(0, n_seg, ckpt_every)]
    header = "round,swap_rate,energy_min,energy_cold"
    stats_path = run_folder / "stats.csv"
    if not (start_round > 0 and stats_path.exists()):
        stats_path.write_text(header + "\n")
    else:
        _truncate_stats(stats_path, start_round)

    # transient-device-error retry, mirroring run_sampling.run_chunk: the
    # chunk is a pure function of (states, key, round offset), so replaying
    # it from a host snapshot is bitwise-neutral
    chunk_retries = int(samp.get("chunk_retries", 1))

    def run_chunk(states, key, lo, hi):
        snap = jax.device_get((states, key)) if chunk_retries > 0 else None
        for attempt in range(chunk_retries + 1):
            try:
                out_states, rec = trun_cache[hi - lo](
                    states, ladder, key, jnp.asarray(start_round + lo, jnp.int32))
                jax.block_until_ready(rec.energy)
                return out_states, rec
            except jax.errors.JaxRuntimeError:
                if attempt >= chunk_retries:
                    raise
                logger.warning(
                    "device error in rounds %d-%d; retrying (%d/%d)",
                    start_round + lo + 1, start_round + hi,
                    attempt + 1, chunk_retries,
                )
                states, key = jax.tree.map(jnp.asarray, snap)

    rec_parts = []
    trun_cache = {}
    for lo, hi in chunk_bounds:
        # one compiled program per chunk LENGTH; the round offset is a
        # traced argument, not baked into the closure
        if hi - lo not in trun_cache:
            if inc_engine is None:
                trun_cache[hi - lo] = make_tempered_run(sweep, n_rounds=hi - lo)
            else:
                # MCState in/out (checkpoint schema unchanged); inside,
                # caches are rebuilt from the occupancy (one full eval per
                # replica per chunk) and the tempered rounds run over
                # IncState — the swap phase gathers the caches with the
                # configurations
                trun = make_tempered_run(sweep, n_rounds=hi - lo)

                def inc_trun(mcs, ladder_c, key_c, start_c, _trun=trun):
                    inc0 = jax.vmap(inc_engine.init_state)(
                        mcs.key, mcs.site_state)
                    inc1, rec = _trun(inc0, ladder_c, key_c, start_c)
                    out = mcs._replace(site_state=inc1.site_state,
                                       energy=inc1.energy, key=inc1.key)
                    return out, rec

                from surface_sampling_tpu.ops.pallas_painn import (
                    scoped_vmem_compiler_options,
                )

                n_slots = int(d.pristine_positions.shape[0]
                              + d.site_coords.shape[0]
                              * d.code_offsets.shape[1])
                trun_cache[hi - lo] = jax.jit(
                    inc_trun,
                    compiler_options=scoped_vmem_compiler_options(n_slots))
        out_states, rec = run_chunk(states, key, lo, hi)
        states = out_states
        key = jnp.asarray(np.asarray(rec.swap_key)[-1], jnp.uint32)
        rec_parts.append(rec)
        e = np.asarray(rec.energy)
        sw = np.asarray(rec.swap_rate)
        with stats_path.open("a") as f:
            f.write("\n".join(
                f"{start_round + lo + i + 1},{sw[i]:.4f},"
                f"{e[i].min():.6f},{e[i, -1]:.6f}" for i in range(hi - lo)) + "\n")
        save_checkpoint(run_folder / "checkpoint.npz", out_states,
                        start_round + hi, np.asarray(ladder),
                        extra={"swap_key": np.asarray(key)})
        if len(chunk_bounds) > 1:
            logger.info("checkpoint at round %d/%d", start_round + hi, n_rounds)

    energy = np.concatenate([np.asarray(r.energy) for r in rec_parts], axis=0)
    swap = np.concatenate([np.asarray(r.swap_rate) for r in rec_parts], axis=0)
    plot_energy_analysis(energy.min(axis=1), swap, save_folder=run_folder)
    np.savez_compressed(
        run_folder / "history.npz",
        site_state=np.concatenate(
            [np.asarray(r.site_state) for r in rec_parts], axis=0),
        energy=energy, swap_rate=swap, ladder=np.asarray(ladder),
        start_round=np.asarray(start_round))
    best = float(energy.min())
    logger.info("Best energy %.4f eV; mean swap rate %.2f", best, swap.mean())
    return {
        "energy_hist": energy,
        "frac_accept_hist": swap,
        "adsorption_count_hist": np.zeros_like(swap),
        "best_energy": best,
        "run_folder": run_folder,
    }


def _run_population_annealing(asys, run_folder, states, temps, cfg, samp,
                              logger, seed, start_sweep: int = 0,
                              pa_key=None, prev_temps=None):
    """Population-annealing variant of run_sampling
    (parallel/population.py): the chain batch is one importance-
    reweighted, resampled population following the anneal schedule.
    Config keys: ``population_annealing: true`` +
    ``resample_threshold`` (ESS/C trigger, default 0.5).

    Beyond the reference's capabilities, the run produces a free-energy
    estimate: cumulative dlogZ = log[Z(T_end)/Z(T_start)]
    (pa_free_energy.json), plus per-sweep ESS / resampling telemetry in
    stats.csv and sampling_quality.json.

    Resume: ``pa_key``/``start_sweep`` come from a prior checkpoint; the
    continuation reweights from the checkpointed sweep's temperature
    (the ``t_prev`` argument of the PA runner), so chunking and resume
    agree with an uninterrupted schedule."""
    import jax
    import jax.numpy as jnp

    from surface_sampling_tpu.core import make_sweep_fn
    from surface_sampling_tpu.core.events import make_canonical_step, make_semigrand_step
    from surface_sampling_tpu.core.state import realize_numbers, realize_positions
    from surface_sampling_tpu.io import save_checkpoint
    from surface_sampling_tpu.parallel import make_population_annealing_run
    from surface_sampling_tpu.structure.io import write_cif
    from surface_sampling_tpu.utils.plot import plot_summary_stats

    d = asys.run.d
    se_fn = asys.run.state_energy_fn
    n_chains = int(np.asarray(states.site_state).shape[0])
    threshold = float(samp.get("resample_threshold", 0.5))
    if cfg.canonical:
        step_fn = make_canonical_step(d, se_fn, criterion=cfg.criterion,
                                      filter_distance=cfg.filter_distance)
    else:
        step_fn = make_semigrand_step(d, se_fn, criterion=cfg.criterion,
                                      filter_distance=cfg.filter_distance)
    sweep = make_sweep_fn(step_fn, cfg.sweep_size)
    n_rounds = len(temps)
    n_seg = n_rounds - start_sweep
    temps_seg = np.asarray(temps, np.float64)[start_sweep:]
    logger.info(
        "Population annealing: %d chains, %d sweeps %.3f -> %.3f, "
        "resample at ESS/C < %.2f",
        n_chains, n_seg, temps_seg[0], temps_seg[-1], threshold,
    )
    key = (jnp.asarray(pa_key, jnp.uint32) if pa_key is not None
           else jax.random.PRNGKey(seed + 2))

    ckpt_every = int(samp.get("checkpoint_interval", 0) or 0)
    if not 0 < ckpt_every < n_seg:
        chunk_bounds = [(0, n_seg)]
    else:
        chunk_bounds = [(lo, min(lo + ckpt_every, n_seg))
                        for lo in range(0, n_seg, ckpt_every)]
    header = "sweep,temp,energy_mean,energy_min,ess_frac,dlogz,resampled"
    stats_path = run_folder / "stats.csv"
    if not (start_sweep > 0 and stats_path.exists()):
        stats_path.write_text(header + "\n")
    else:
        _truncate_stats(stats_path, start_sweep)

    chunk_retries = int(samp.get("chunk_retries", 1))
    parun_cache = {}

    def run_chunk(states, key, lo, hi):
        # chunk purity: (states, key, t_prev) fully determine the chunk,
        # so a transient-device-error replay is bitwise-neutral
        if hi - lo not in parun_cache:
            parun_cache[hi - lo] = make_population_annealing_run(
                sweep, resample_threshold=threshold)
        t_prev = (
            None if start_sweep + lo == 0
            else jnp.asarray(float(np.asarray(temps)[start_sweep + lo - 1]),
                             jnp.float32)
        )
        snap = jax.device_get((states, key)) if chunk_retries > 0 else None
        for attempt in range(chunk_retries + 1):
            try:
                out_states, rec = parun_cache[hi - lo](
                    states, jnp.asarray(temps_seg[lo:hi], jnp.float32), key,
                    t_prev)
                jax.block_until_ready(rec.energy)
                return out_states, rec
            except jax.errors.JaxRuntimeError:
                if attempt >= chunk_retries:
                    raise
                logger.warning(
                    "device error in sweeps %d-%d; retrying (%d/%d)",
                    start_sweep + lo + 1, start_sweep + hi,
                    attempt + 1, chunk_retries,
                )
                states, key = jax.tree.map(jnp.asarray, snap)

    rec_parts = []
    for lo, hi in chunk_bounds:
        out_states, rec = run_chunk(states, key, lo, hi)
        states = out_states
        # continue the exact resampling-key sequence (bitwise-neutral
        # chunking, mirroring tempering's swap_key carry)
        key = jnp.asarray(np.asarray(rec.final_key), jnp.uint32)
        rec_parts.append(rec)
        e = np.asarray(rec.energy)
        ess = np.asarray(rec.ess) / n_chains
        dz = np.asarray(rec.dlogz)
        rs = np.asarray(rec.resampled)
        with stats_path.open("a") as f:
            f.write("\n".join(
                f"{start_sweep + lo + i + 1},{temps_seg[lo + i]:.6f},"
                f"{e[i].mean():.6f},{e[i].min():.6f},{ess[i]:.4f},"
                f"{dz[i]:.6f},{int(rs[i])}" for i in range(hi - lo)) + "\n")
        save_checkpoint(run_folder / "checkpoint.npz", out_states,
                        start_sweep + hi, np.asarray(temps),
                        extra={"pa_key": np.asarray(key)})
        if len(chunk_bounds) > 1:
            logger.info("checkpoint at sweep %d/%d", start_sweep + hi, n_rounds)

    energy = np.concatenate([np.asarray(r.energy) for r in rec_parts], axis=0)
    ess = np.concatenate([np.asarray(r.ess) for r in rec_parts], axis=0)
    dlogz = np.concatenate([np.asarray(r.dlogz) for r in rec_parts], axis=0)
    resampled = np.concatenate(
        [np.asarray(r.resampled) for r in rec_parts], axis=0)
    site_state = np.concatenate(
        [np.asarray(r.site_state) for r in rec_parts], axis=0)

    # the free-energy artifact: log[Z(T_end)/Z(T_start)] over this
    # segment (for a resumed run the earlier segments' contributions are
    # already in the previous stats.csv rows; sum the dlogz column for
    # the full-schedule estimate)
    dlogz_total = float(dlogz.sum())
    (run_folder / "pa_free_energy.json").write_text(json.dumps({
        "log_Z_ratio": dlogz_total,
        "t_start": float(temps_seg[0]),
        "t_end": float(temps_seg[-1]),
        "start_sweep": int(start_sweep),
        "n_chains": n_chains,
        "ess_frac_min": float(ess.min() / n_chains),
        "resample_fraction": float(resampled.mean()),
        "note": "log_Z_ratio = sum_k dlogz over this segment; "
                "F(T_end) - via Z ratios - is -T_end*(log_Z_ratio + log Z(T_start))",
    }))
    (run_folder / "sampling_quality.json").write_text(json.dumps({
        "ess_frac_final": float(ess[-1] / n_chains),
        "ess_frac_min": float(ess.min() / n_chains),
        "resample_fraction": float(resampled.mean()),
        "log_Z_ratio": dlogz_total,
        "n_chains": n_chains, "sweeps": int(len(temps_seg)),
    }))
    plot_summary_stats(
        energy.mean(axis=1), ess / n_chains, resampled.astype(float),
        len(temps_seg), save_folder=run_folder,
    )

    # best structure across the whole population history
    flat = energy.reshape(-1)
    best = int(np.argmin(flat))
    bs, bc = divmod(best, n_chains)
    ss_best = jnp.asarray(site_state[bs, bc])
    numbers = np.asarray(realize_numbers(d, ss_best))
    pos = np.asarray(realize_positions(d, ss_best))
    keep = numbers > 0
    write_cif(run_folder / f"best_energy_{flat[best]:.3f}.cif",
              Structure(numbers[keep], pos[keep], asys.spec.cell))

    np.savez_compressed(
        run_folder / "history.npz",
        site_state=site_state, energy=energy, ess=ess, dlogz=dlogz,
        resampled=resampled, temps=temps_seg,
        start_sweep=np.asarray(start_sweep))
    logger.info(
        "Best surface energy %.4f eV; log[Z(%.3g)/Z(%.3g)] = %.3f "
        "(segment); min ESS/C %.2f; resampled %.0f%% of sweeps",
        flat[best], temps_seg[-1], temps_seg[0], dlogz_total,
        float(ess.min() / n_chains), 100 * resampled.mean(),
    )
    return {
        "energy_hist": energy.T,
        "frac_accept_hist": np.tile(ess[None, :] / n_chains, (1, 1)),
        "adsorption_count_hist": np.zeros((1, len(temps_seg))),
        "best_energy": float(flat[best]),
        "log_Z_ratio": dlogz_total,
        "run_folder": run_folder,
    }


def make_run_folder(settings: dict, surface_name: str, base_dir=None) -> Path:
    samp = settings["sampling_settings"]
    explicit = samp.get("run_folder")
    if explicit:
        p = Path(explicit)
        p.mkdir(parents=True, exist_ok=True)
        return p
    return setup_folders(
        surface_name,
        canonical=samp.get("canonical", False),
        total_sweeps=samp["total_sweeps"],
        start_temp=samp["start_temp"],
        alpha=samp.get("alpha", 1.0),
        base_dir=base_dir,
    )
