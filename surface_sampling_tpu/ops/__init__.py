"""Device-side geometry and math primitives (JAX/XLA, Pallas where hot)."""

from surface_sampling_tpu.ops.neighbors import (
    mic_displacements,
    pairwise_distances,
    pair_mask,
)
from surface_sampling_tpu.ops.splines import (
    lammps_spline_coeffs,
    spline_eval,
    spline_eval_deriv,
)

__all__ = [
    "mic_displacements",
    "pairwise_distances",
    "pair_mask",
    "lammps_spline_coeffs",
    "spline_eval",
    "spline_eval_deriv",
]
