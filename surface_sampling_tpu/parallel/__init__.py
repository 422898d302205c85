"""Chain, ensemble and device parallelism.

The reference is strictly single-process/single-chain (SURVEY §2.3: no
DP/TP/PP, no NCCL/MPI — one Markov chain per Python process). The honest
parallel axes this problem admits are designed here as first-class
citizens:

  * chain parallelism    — ``vmap`` over independent Markov chains;
  * data parallelism     — chain batches sharded over an ICI mesh with
    ``shard_map`` (embarrassingly parallel; collectives only for metrics);
  * parallel tempering   — per-chain temperature ladders with neighbor
    replica exchange (a new capability the per-chain design gives for
    free);
  * ensemble parallelism — the NN-ensemble weight axis vmapped and
    shardable over a second mesh axis (models/ensemble.py);
  * sharded fine-tuning  — data-parallel (one grad pmean per step) and
    member-parallel (zero-collective) train steps (training.py);
  * population annealing — importance-reweighted chain resampling along
    the anneal schedule with a free-energy estimator (population.py);
  * multi-pod scaling    — hierarchical (pod x chip) meshes where the
    inner axis rides ICI and only scheduled, infrequent exchanges cross
    DCN (mesh.pod_mesh, chains.make_hierarchical_chain_run,
    tempering.make_tempered_run(pod_size=...)).
"""

from surface_sampling_tpu.parallel.chains import (
    chain_states,
    make_chain_run,
    make_hierarchical_chain_run,
    make_sharded_chain_run,
)
from surface_sampling_tpu.parallel.mesh import chain_mesh, pod_mesh
from surface_sampling_tpu.parallel.population import (
    make_population_annealing_run,
)
from surface_sampling_tpu.parallel.tempering import (
    make_tempered_run,
    temperature_ladder,
)
from surface_sampling_tpu.parallel.training import (
    make_ensemble_sharded_train_step,
    make_sharded_train_step,
    train_sharded,
)

__all__ = [
    "chain_states",
    "chain_mesh",
    "make_chain_run",
    "make_ensemble_sharded_train_step",
    "make_hierarchical_chain_run",
    "make_population_annealing_run",
    "make_sharded_chain_run",
    "make_sharded_train_step",
    "make_tempered_run",
    "pod_mesh",
    "temperature_ladder",
    "train_sharded",
]
