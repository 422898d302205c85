"""On-device electrochemical (Pourbaix) grand potential.

Re-design of the reference's NFFPourbaix calculator
(mcmc/calculators/calculators.py:138-361). The acceptance energy is

    Phi(pH, phi) = -(dG1 + dG2)
                 = E_slab + corrections(counts)
                   - sum_e n_e [ mu_std_e
                                + dG2_std_e - num_e_e*phi
                                - ln(10)*num_H_e*kT*pH + kT*ln(conc_e) ]

which is linear in the per-element counts up to the adsorbate-correction
term (an integer formula division, calculators.py:254-271), so the device
computation is one dot product plus a couple of floor ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from surface_sampling_tpu.constants import SYMBOL_FROM_Z
from surface_sampling_tpu.core.spec import SurfaceSpec
from surface_sampling_tpu.pourbaix.atoms import PourbaixAtom


def make_pourbaix_surface_energy(
    spec: SurfaceSpec,
    pourbaix_atoms: dict[str, PourbaixAtom],
    phi: float,
    pH: float,
    temp: float = 0.0257,
    adsorbate_corrections: dict[str, float] | None = None,
):
    """Build surface_energy(e_pot, counts) for the MC engine.

    Args:
        pourbaix_atoms: per-element PourbaixAtom table (pourbaix/atoms.py).
        phi: electrode potential vs SHE (V).
        pH: pH.
        temp: k_B T in eV (reference default 0.0257, calculators.py:190).
        adsorbate_corrections: e.g. {"OH": 0.23 - 0.30} — per-group free-
            energy corrections applied to the slab energy, with the
            reference's H2O-subtraction convention for excess H.
    """
    coeff = np.zeros(len(spec.element_zs))
    for i, z in enumerate(spec.element_zs):
        sym = SYMBOL_FROM_Z[int(z)]
        atom = pourbaix_atoms.get(sym)
        if atom is None:
            raise KeyError(f"no PourbaixAtom for element {sym}")
        g2 = (
            atom.delta_G2_std
            - atom.num_e * phi
            - np.log(10.0) * atom.num_H * temp * pH
            + temp * np.log(atom.species_conc)
        )
        coeff[i] = atom.atom_std_state_energy + g2
    coeff_j = jnp.asarray(coeff)

    corrections = []
    if adsorbate_corrections:
        from surface_sampling_tpu.constants import parse_formula

        z_slot = {int(z): slot for slot, z in enumerate(spec.element_zs)}
        sym_slot = {SYMBOL_FROM_Z[z]: slot for z, slot in z_slot.items()}
        for formula, corr in adsorbate_corrections.items():
            counts_f = parse_formula(formula)
            corrections.append((counts_f, float(corr)))
        h_slot = sym_slot.get("H")
        o_slot = sym_slot.get("O")

    def surface_energy(e_pot, counts):
        se = e_pot - jnp.dot(counts, coeff_j.astype(counts.dtype))
        if corrections:
            n_h = counts[h_slot] if h_slot is not None else jnp.asarray(0.0, counts.dtype)
            n_o = counts[o_slot] if o_slot is not None else jnp.asarray(0.0, counts.dtype)
            for counts_f, corr in corrections:
                if "O" in counts_f and "H" in counts_f:
                    # excess H assumed to come from intact water: subtract
                    # HO_diff x H2O before counting groups
                    ho_diff = jnp.maximum(n_h - n_o, 0.0)
                    eff = {"H": n_h - 2 * ho_diff, "O": n_o - ho_diff}
                else:
                    eff = {"H": n_h, "O": n_o}
                ratios = []
                for sym, n_in_f in counts_f.items():
                    avail = eff.get(sym)
                    if avail is None:
                        from surface_sampling_tpu.constants import Z_FROM_SYMBOL

                        slot = spec.z_to_element[Z_FROM_SYMBOL[sym]]
                        avail = counts[slot]
                    ratios.append(avail / n_in_f)
                div = jnp.floor(jnp.minimum(*ratios) + 1e-6) if len(ratios) > 1 else jnp.floor(
                    ratios[0] + 1e-6
                )
                se = se + jnp.maximum(div, 0.0) * corr
        return se

    return surface_energy
