"""surface_sampling_tpu — TPU-native Virtual Surface Site Relaxation Monte Carlo (VSSR-MC).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
learningmatter-mit/surface-sampling (reference: /root/reference, mcmc/ package):
semi-grand-canonical and canonical MCMC over virtual adsorption sites on crystal
slabs, with on-device relaxation, classical (EAM/Tersoff/SW) and neural (PaiNN
ensemble) potentials, Pourbaix electrochemical sampling, latent-space clustering
and uncertainty quantification.

Design principles (TPU-first, not a port):
  * fixed-shape, mask-based state — adsorption/desorption never changes array
    shapes, so the full MC step lives inside ``jax.lax.scan`` under one ``jit``;
  * rejection is a ``tree select``, not a deep copy (reference:
    mcmc/system.py:149-182 uses full Atoms copies per move);
  * thousands of independent chains via ``vmap``; chain batches shard over an
    ICI device mesh via ``shard_map``; per-chain temperatures give annealing
    and parallel tempering for free;
  * classical potentials are dense masked tensor ops (MXU/VPU friendly),
    neural potentials are batched JAX models with an ensemble weight axis.
"""

__version__ = "0.1.0"

from surface_sampling_tpu.constants import Z_FROM_SYMBOL, SYMBOL_FROM_Z

__all__ = ["Z_FROM_SYMBOL", "SYMBOL_FROM_Z", "__version__"]
