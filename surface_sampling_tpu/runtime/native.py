"""ctypes bindings for the surfkit native runtime (with numpy fallbacks).

Compiled lazily on first use (g++ -O3 -shared); failures fall back to
numpy implementations so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_SRC = _DIR / "csrc" / "surfkit.cpp"
_LIB_PATH = _DIR / "libsurfkit.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             str(_SRC), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain dependent
        logger.warning("surfkit native build failed (%s); using numpy fallback", e)
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        logger.warning("surfkit load failed: %s", e)
        return None
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    lib.sk_cell_list_neighbors.restype = ctypes.c_int64
    lib.sk_cell_list_neighbors.argtypes = [
        c_d, ctypes.c_int64, c_d, c_i32, ctypes.c_double, ctypes.c_int64,
        c_i32, c_d, c_i32,
    ]
    lib.sk_min_selected_distance.restype = ctypes.c_double
    lib.sk_min_selected_distance.argtypes = [
        c_d, ctypes.c_int64, c_d, c_i32, c_i32, ctypes.c_int64,
    ]
    lib.sk_write_xyz_frames.restype = ctypes.c_int32
    lib.sk_write_xyz_frames.argtypes = [
        ctypes.c_char_p, c_i32, c_d, c_d, ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def _ptr_d(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ptr_i(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def cell_list_neighbors(
    positions: np.ndarray,
    cell: np.ndarray,
    cutoff: float,
    max_neighbors: int = 64,
    pbc=(True, True, True),
):
    """O(N) neighbor list on the host. Returns
    (nbr_idx (N, M) int32, nbr_disp (N, M, 3), nbr_count (N,), max_count).

    ``max_count`` may exceed ``max_neighbors`` — the canonical use is sizing
    the padded device neighbor capacity before compiling the MC program.
    """
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    pbc_arr = np.ascontiguousarray(np.asarray(pbc, dtype=np.int32))
    n = len(positions)
    lib = load_library()
    nbr_idx = np.zeros((n, max_neighbors), dtype=np.int32)
    nbr_disp = np.zeros((n, max_neighbors, 3), dtype=np.float64)
    nbr_count = np.zeros(n, dtype=np.int32)
    if lib is not None:
        max_count = lib.sk_cell_list_neighbors(
            _ptr_d(positions), n, _ptr_d(cell), _ptr_i(pbc_arr),
            float(cutoff), max_neighbors,
            _ptr_i(nbr_idx), _ptr_d(nbr_disp), _ptr_i(nbr_count),
        )
        return nbr_idx, nbr_disp, nbr_count, int(max_count)
    # numpy fallback: dense image scan (exact, O(N^2))
    from surface_sampling_tpu.ops.neighbors import pair_shifts

    shifts = pair_shifts(cell, cutoff, pbc=pbc)
    diff = positions[None, :, None, :] - (positions[None, None, :, :] + shifts[:, None, None, :])
    r2 = np.sum(diff * diff, axis=-1)
    mask = (r2 < cutoff**2) & (r2 > 1e-20)
    max_count = 0
    for i in range(n):
        ks, js = np.where(mask[:, i, :])
        cnt = len(js)
        max_count = max(max_count, cnt)
        m = min(cnt, max_neighbors)
        nbr_idx[i, :m] = js[:m]
        nbr_disp[i, :m] = diff[ks[:m], i, js[:m]]
        nbr_count[i] = m
    return nbr_idx, nbr_disp, nbr_count, int(max_count)


def min_selected_distance(positions, cell, selected_idx, pbc=(True, True, True)) -> float:
    """Minimum MIC distance among the selected atoms (native fast path for
    the distance filter over large trajectories)."""
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    sel = np.ascontiguousarray(np.asarray(selected_idx, dtype=np.int32))
    lib = load_library()
    if lib is not None:
        pbc_arr = np.ascontiguousarray(np.asarray(pbc, dtype=np.int32))
        return float(
            lib.sk_min_selected_distance(
                _ptr_d(positions), len(positions), _ptr_d(cell), _ptr_i(pbc_arr),
                _ptr_i(sel), len(sel),
            )
        )
    if len(sel) < 2:
        return 1e30
    p = positions[sel]
    diff = p[:, None, :] - p[None, :, :]
    frac = diff @ np.linalg.inv(cell)
    frac -= np.round(frac * np.asarray(pbc)) * np.asarray(pbc)
    d = np.linalg.norm(frac @ cell, axis=-1)
    iu = np.triu_indices(len(p), k=1)
    return float(d[iu].min())


def write_xyz_frames(path, numbers, positions_frames, cell) -> None:
    """Fast multi-frame XYZ trajectory dump (native when available)."""
    numbers = np.ascontiguousarray(numbers, dtype=np.int32)
    frames = np.ascontiguousarray(positions_frames, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    if frames.ndim == 2:
        frames = frames[None]
    lib = load_library()
    if lib is not None:
        rc = lib.sk_write_xyz_frames(
            str(path).encode(), _ptr_i(numbers), _ptr_d(frames), _ptr_d(cell),
            frames.shape[0], frames.shape[1],
        )
        if rc == 0:
            return
    from surface_sampling_tpu.constants import numbers_to_symbols

    with open(path, "w") as f:
        cellstr = " ".join(f"{x:.8f}" for x in cell.flatten())
        syms = numbers_to_symbols(numbers)
        for frame in frames:
            f.write(f"{len(numbers)}\n")
            f.write(f'Lattice="{cellstr}" Properties=species:S:1:pos:R:3\n')
            for s, p in zip(syms, frame):
                f.write(f"{s} {p[0]:.8f} {p[1]:.8f} {p[2]:.8f}\n")
