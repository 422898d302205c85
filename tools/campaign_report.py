"""Summarize a sampling run folder into a markdown campaign report.

Reads the artifacts the CLI drivers write (stats.csv, history.npz,
sampling_quality.json, settings provenance copy) and emits a compact
markdown section: configuration, annealing outcome, best reconstructions
(surface energy + composition), per-chain statistics, and mixing
diagnostics. Used to produce docs/CAMPAIGN_SRTIO3.md — the end-to-end
"does the framework do the reference's science job at scale" artifact
(reference workflow: scripts/sample_surface.py + tutorials/SrTiO3_001.ipynb).

Usage: python tools/campaign_report.py RUN_DIR [RUN_DIR ...] > report.md
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

import numpy as np


def summarize(run_dir: Path) -> str:
    out = []
    settings = json.loads((run_dir / "settings.json").read_text())
    samp = settings.get("sampling_settings", {})
    calc = settings.get("calc_settings", {})
    h = np.load(run_dir / "history.npz")
    energy = h["energy"]            # (chains, sweeps)
    n_ads = h["n_ads"]
    acc = h["accept_rate"]
    temps = h["temps"]
    site_state = h["site_state"]    # (chains, sweeps, n_sites)
    n_chains, n_sweeps = energy.shape

    out.append(f"### Run `{run_dir.name}`")
    out.append("")
    out.append(
        f"* **Configuration**: {n_chains} chains x {samp.get('total_sweeps')} sweeps "
        f"x {samp.get('sweep_size')} steps; T {temps[0]:.3g} -> {temps[-1]:.3g} eV"
        f" (alpha {samp.get('alpha')}); adsorbates {samp.get('adsorbates')};"
        f" chem_pots {calc.get('chem_pots')}; relax_atoms={calc.get('relax_atoms')}."
    )
    total_moves = n_chains * int(samp.get("total_sweeps", n_sweeps)) * int(
        samp.get("sweep_size", 1)
    )
    out.append(f"* **Total MC moves**: {total_moves:,} "
               f"(each = one ensemble surface-energy evaluation"
               f"{' + a 20-step FIRE relaxation' if calc.get('relax_atoms') else ''}).")

    # best reconstruction
    flat = np.argmin(energy)
    ci, si = np.unravel_index(flat, energy.shape)
    best_e = float(energy[ci, si])
    best_state = site_state[ci, si]
    occ = best_state[best_state > 0]
    ads = samp.get("adsorbates", [])
    comp = {a: int(np.sum(occ == k + 1)) for k, a in enumerate(ads)}
    out.append(f"* **Best surface energy**: {best_e:.4f} eV "
               f"(chain {ci}, sweep {si + 1}); composition {comp} "
               f"on {site_state.shape[-1]} virtual sites.")

    # final-temperature population statistics
    e_fin = energy[:, -1]
    out.append(
        f"* **Final-sweep population** (T={temps[-1]:.3g} eV): surface energy "
        f"mean {e_fin.mean():.3f} eV, min {e_fin.min():.3f}, max {e_fin.max():.3f}, "
        f"std {e_fin.std():.3f}; adsorbate count mean {n_ads[:, -1].mean():.1f}."
    )
    out.append(
        f"* **Acceptance**: {acc[:, 0].mean():.1%} at T={temps[0]:.3g} -> "
        f"{acc[:, -1].mean():.1%} at T={temps[-1]:.3g}."
    )

    sq = run_dir / "sampling_quality.json"
    if sq.exists():
        q = json.loads(sq.read_text())
        tau, ess = q.get("tau_int_sweeps"), q.get("pooled_ess")
        if tau is not None and ess is not None:
            out.append(
                f"* **Mixing**: tau_int {tau:.2f} sweeps, "
                f"pooled ESS {ess:.0f} over {n_chains} chains."
            )
        else:
            out.append(f"* **Mixing**: {q}")
    log = run_dir / "mc.log"
    if log.exists():
        for line in log.read_text().splitlines():
            if "Time taken" in line or "Timing: total" in line:
                out.append(f"* `{line.split(' - ')[-1].strip()}`")
    cifs = sorted(run_dir.glob("best_energy_*.cif"))
    if cifs:
        out.append(f"* Best structure exported: `{cifs[-1].name}`.")
    out.append("")
    return "\n".join(out)


def main() -> None:
    for arg in sys.argv[1:]:
        print(summarize(Path(arg)))


if __name__ == "__main__":
    main()
