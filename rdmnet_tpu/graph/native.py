"""ctypes bindings for the native C++ host-side graph builder.

The primary graph path is the jitted on-device builder
(rdmnet_tpu/graph/pyramid.py); this native path serves preprocessing,
calibration, and CPU-only fallbacks — the role the reference's
`rdmnet.ext` torch extension plays (reference: setup.py:5-21,
geotransformer/extensions/pybind.cpp:6-18), without libtorch/pybind.

Build once with ``make -C native`` (or ``ensure_built()``).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "librdmnet_native.so")

_lib: Optional[ctypes.CDLL] = None


def ensure_built(force: bool = False) -> str:
    if force or not osp.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    ensure_built()
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)

    lib.rdm_grid_subsample.restype = ctypes.c_int32
    lib.rdm_grid_subsample.argtypes = [f32p, ctypes.c_int32, ctypes.c_float, f32p, ctypes.c_int32]
    lib.rdm_radius_knn.restype = None
    lib.rdm_radius_knn.argtypes = [
        f32p, ctypes.c_int32, f32p, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32, i32p,
    ]
    _lib = lib
    return lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def grid_subsample_native(points: np.ndarray, voxel_size: float, cap: int,
                          pad_coord: float = 1.0e9) -> Tuple[np.ndarray, int]:
    """Voxel-centroid subsample (native). Returns ((cap, 3) padded, count)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    out = np.full((cap, 3), pad_coord, np.float32)
    count = lib.rdm_grid_subsample(
        _f32p(points), np.int32(len(points)), ctypes.c_float(voxel_size),
        _f32p(out), np.int32(cap),
    )
    return out, int(count)


def radius_knn_native(q_points: np.ndarray, s_points: np.ndarray, s_count: int,
                      radius: float, k: int, sentinel: Optional[int] = None) -> np.ndarray:
    """Radius-bounded kNN (native), sentinel-padded, distance-sorted."""
    lib = _load()
    q = np.ascontiguousarray(q_points, np.float32)
    s = np.ascontiguousarray(s_points, np.float32)
    sentinel = len(s) if sentinel is None else sentinel
    out = np.empty((len(q), k), np.int32)
    lib.rdm_radius_knn(
        _f32p(q), np.int32(len(q)), _f32p(s), np.int32(s_count),
        ctypes.c_float(radius), np.int32(k), np.int32(sentinel), _i32p(out),
    )
    return out


def build_pyramid_native(points: np.ndarray, spec, pad_coord: float = 1.0e9):
    """Full pyramid on host (native ops), same layout as the device builder."""
    level_points: List[np.ndarray] = []
    counts: List[int] = []
    p, c = points[: spec.caps[0]], min(len(points), spec.caps[0])
    # canonical level-0 order: the device builder's own anchored voxel key
    # (single-sourced numpy twin, incl. the clip that keeps the max key
    # below the int32 invalid sentinel)
    from rdmnet_tpu.ops.grid_subsample import voxel_sort_key_np

    key = voxel_sort_key_np(p, 2.0 * spec.voxel_size)
    p = p[np.argsort(key, kind="stable")]
    padded = np.full((spec.caps[0], 3), pad_coord, np.float32)
    padded[:c] = p
    level_points.append(padded)
    counts.append(c)

    voxel = spec.voxel_size
    for lvl in range(1, spec.num_stages):
        voxel *= 2
        sub, cnt = grid_subsample_native(
            level_points[-1][: counts[-1]], voxel, spec.caps[lvl], pad_coord
        )
        level_points.append(sub)
        counts.append(cnt)

    neighbors, subsampling, upsampling = [], [], []
    radius = spec.search_radius
    for lvl in range(spec.num_stages):
        k = spec.neighbor_limits[lvl]
        nbr = np.full((spec.caps[lvl], k), spec.caps[lvl], np.int32)
        nbr[: counts[lvl]] = radius_knn_native(
            level_points[lvl][: counts[lvl]], level_points[lvl], counts[lvl],
            radius, k, sentinel=spec.caps[lvl],
        )
        neighbors.append(nbr)
        if lvl < spec.num_stages - 1:
            sub = np.full((spec.caps[lvl + 1], k), spec.caps[lvl], np.int32)
            sub[: counts[lvl + 1]] = radius_knn_native(
                level_points[lvl + 1][: counts[lvl + 1]], level_points[lvl],
                counts[lvl], radius, k, sentinel=spec.caps[lvl],
            )
            subsampling.append(sub)
            k_up = spec.upsampling_limit or spec.neighbor_limits[lvl + 1]
            up = np.full((spec.caps[lvl], k_up), spec.caps[lvl + 1], np.int32)
            if lvl >= spec.build_upsampling_from_level:
                up[: counts[lvl]] = radius_knn_native(
                    level_points[lvl][: counts[lvl]], level_points[lvl + 1],
                    counts[lvl + 1], radius * 2, k_up, sentinel=spec.caps[lvl + 1],
                )
            # else: all-sentinel placeholder, matching the device builder's
            # unconsumed-table skip (pyramid.py build_upsampling_from_level)
            # — this is also the single most expensive host search
            upsampling.append(up)
        radius *= 2

    return {
        "points": level_points,
        "counts": counts,
        "neighbors": neighbors,
        "subsampling": subsampling,
        "upsampling": upsampling,
    }
