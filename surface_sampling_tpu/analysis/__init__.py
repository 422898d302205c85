"""Analysis layer: uncertainty quantification and latent-space clustering."""

from surface_sampling_tpu.analysis.clustering import (
    find_closest_points_indices,
    get_cluster_centers,
    pca_whiten,
    perform_clustering,
    select_data_and_save,
    select_representatives,
)
from surface_sampling_tpu.analysis.uncertainty import (
    ConformalPrediction,
    EnsembleUncertainty,
    GMMUncertainty,
    Uncertainty,
    get_unc_class,
    reduce_order,
)

__all__ = [
    "ConformalPrediction",
    "EnsembleUncertainty",
    "GMMUncertainty",
    "Uncertainty",
    "find_closest_points_indices",
    "get_cluster_centers",
    "get_unc_class",
    "pca_whiten",
    "perform_clustering",
    "reduce_order",
    "select_data_and_save",
    "select_representatives",
]
