"""Native host runtime (C++ surfkit, ctypes-bound, numpy fallback)."""

from surface_sampling_tpu.runtime.native import (
    cell_list_neighbors,
    load_library,
    min_selected_distance,
    write_xyz_frames,
)

__all__ = [
    "cell_list_neighbors",
    "load_library",
    "min_selected_distance",
    "write_xyz_frames",
]
