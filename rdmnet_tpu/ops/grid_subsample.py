"""Fixed-capacity voxel-grid subsampling (jittable, static shapes).

TPU-native replacement for the reference's C++ grid subsampling
(reference: geotransformer/extensions/cpu/grid_subsampling/
grid_subsampling_cpu.cpp:3-48): each voxel of side ``voxel_size`` emits the
centroid of the points it contains. The voxel grid is anchored at
``floor(min / voxel) * voxel`` exactly like the C++.

Design differences (deliberate, TPU-first):
* static output capacity ``cap`` with a valid-count instead of a dynamic
  result (the C++ returns exactly one point per occupied voxel);
* output voxels are ordered lexicographically by (x, y, z) voxel coordinate —
  deterministic, whereas the C++ emits std::unordered_map iteration order.
  Nothing downstream depends on the specific point order (all consumers
  re-derive neighbor structure), so this is behavior-preserving; the
  x-primary order additionally enables the banded radius search;
* implemented as a lexicographic multi-key sort + segment-mean, which XLA
  lowers to an efficient on-device sort — no hash tables, no host round trip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_PAD_COORD = 1.0e9  # coordinate assigned to padded output slots

# Voxel-key packing: 11/10/10 bits (x/y/z), x primary. cx is clipped to
# 2046 (not 2047) so the maximum packed key stays strictly below the int32
# invalid-point sentinel — (2047<<20)|(1023<<10)|1023 would EQUAL
# iinfo(int32).max and silently delete a valid point in that corner cell.
_CLIP = (2046, 1023, 1023)
_INVALID_KEY = jnp.iinfo(jnp.int32).max


def voxel_sort_key(points: jnp.ndarray, valid: jnp.ndarray, cell: float):
    """(N, 3) points -> (key (N,) int32, n_clipped () int32).

    The single source of truth for the x-major voxel ordering that
    grid_subsample, the level-0 sort (graph/pyramid.py) and the banded
    radius search all rely on. Grid anchored at floor(min/cell)*cell over
    valid points (C++ parity). Invalid points get the int32-max key (sort
    last). ``n_clipped`` counts VALID points whose voxel coordinate fell
    outside the 2047/1024/1024-cell range and was clipped — those points
    break the x-monotonicity the banded search assumes, so callers surface
    the count through the `dropped` telemetry instead of degrading
    silently (one far outlier can shift the anchor and clip everything).
    """
    big = jnp.asarray(jnp.inf, points.dtype)
    masked = jnp.where(valid[:, None], points, big)
    anchor = jnp.floor(jnp.min(masked, axis=0) / cell) * cell
    coords = jnp.floor((points - anchor) / cell).astype(jnp.int32)
    cx = jnp.clip(coords[:, 0], 0, _CLIP[0])
    cy = jnp.clip(coords[:, 1], 0, _CLIP[1])
    cz = jnp.clip(coords[:, 2], 0, _CLIP[2])
    clipped = (
        (coords[:, 0] > _CLIP[0])
        | (coords[:, 1] > _CLIP[1])
        | (coords[:, 2] > _CLIP[2])
    ) & valid
    key = (cx << 20) | (cy << 10) | cz
    key = jnp.where(valid, key, _INVALID_KEY)
    return key, jnp.sum(clipped).astype(jnp.int32)


def voxel_sort_key_np(points, cell: float):
    """Numpy twin of voxel_sort_key for host paths (graph/native.py) —
    same anchor, bit layout and _CLIP constants, so the host level-0 order
    stays row-for-row identical to the device builder's. All-valid input
    assumed (host callers truncate instead of padding)."""
    import numpy as np

    anchor = np.floor(points.min(axis=0) / cell) * cell
    coords = np.floor((points - anchor) / cell).astype(np.int64)
    return (
        (np.clip(coords[:, 0], 0, _CLIP[0]) << 20)
        | (np.clip(coords[:, 1], 0, _CLIP[1]) << 10)
        | np.clip(coords[:, 2], 0, _CLIP[2])
    )


def grid_subsample(
    points: jnp.ndarray,
    num_valid: jnp.ndarray,
    voxel_size: float,
    cap: int,
    return_dropped: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Voxel-centroid subsample a padded point cloud.

    Args:
      points: (N, 3) float32, first ``num_valid`` rows are real points.
      num_valid: () int32 number of valid input points.
      voxel_size: voxel edge length.
      cap: static output capacity (occupied voxels beyond ``cap`` are dropped;
        choose caps so this never clips in practice).
      return_dropped: also return the number of occupied voxels that did NOT
        fit in ``cap`` — the silent-degradation counter surfaced into step
        metrics (0 when capacities are sized correctly).

    Returns:
      sub_points: (cap, 3) float32, padded rows set to a far-away sentinel
        coordinate so they can never be nearest neighbors.
      sub_count: () int32 number of valid output points (<= cap).
      dropped: () int32 overflow voxel count (only if ``return_dropped``).
    """
    n = points.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < num_valid

    # Single-int32-key x-major voxel sort (see voxel_sort_key): several
    # times cheaper on TPU than a 7-operand lexicographic sort, and the
    # x-primary order is the invariant the banded radius search
    # (ops/radius_search.radius_knn_banded) relies on to restrict each
    # query chunk to a contiguous support band. Clipped (out-of-range)
    # valid points are surfaced through the dropped counter.
    key, n_clipped = voxel_sort_key(points, valid, voxel_size)

    skey, sidx = jax.lax.sort((key, idx), num_keys=1)
    sorted_pts = jnp.take(points, sidx, axis=0)
    svalid = skey != _INVALID_KEY

    # Segment ids: new segment whenever the voxel key changes.
    changed = skey[1:] != skey[:-1]
    seg_ids = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(changed.astype(jnp.int32))]
    )
    # Valid points sort first, so their segment ids form [0, sub_count).
    true_count = jnp.where(
        num_valid > 0,
        jnp.max(jnp.where(svalid, seg_ids, -1)) + 1,
        0,
    ).astype(jnp.int32)
    sub_count = jnp.minimum(true_count, cap)

    w = svalid.astype(points.dtype)
    # Bucket `cap` collects invalid points and overflow segments (dropped).
    scatter_ids = jnp.where(svalid, jnp.minimum(seg_ids, cap), cap)
    sums = jax.ops.segment_sum(sorted_pts * w[:, None], scatter_ids, num_segments=cap + 1)[:cap]
    counts = jax.ops.segment_sum(w, scatter_ids, num_segments=cap + 1)[:cap]

    out_valid = jnp.arange(cap, dtype=jnp.int32) < sub_count
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    sub_points = jnp.where(out_valid[:, None], centroids, _PAD_COORD)
    if return_dropped:
        # capacity overflow + out-of-range clip (both silently degrade
        # accuracy if unnoticed; callers surface the sum as telemetry)
        return sub_points, sub_count, jnp.maximum(true_count - cap, 0) + n_clipped
    return sub_points, sub_count
