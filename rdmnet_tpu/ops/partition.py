"""Point-to-node partition and kNN patch extraction (static shapes).

Reimplements reference geotransformer/modules/ops/pointcloud_partition.py:
``point_to_node_partition`` (:61-107) and ``knn_partition`` (:35-57) with the
padding ABI: invalid points/nodes are masked instead of absent, and missing
patch slots carry the sentinel index ``N`` (the point capacity).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rdmnet_tpu.ops.geometry import pairwise_sq_dist

_BIG = 1.0e12


def knn_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    k: int,
    points_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest valid points for each node (reference :35-57).

    Returns (knn_sq_dists, knn_indices), each (M, k)."""
    sq = pairwise_sq_dist(nodes, points)  # (M, N)
    if points_mask is not None:
        sq = jnp.where(points_mask[None, :], sq, _BIG)
    neg_top, idx = jax.lax.top_k(-sq, k)
    return -neg_top, idx.astype(jnp.int32)


def point_to_node_partition(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    nodes: jnp.ndarray,
    nodes_mask: jnp.ndarray,
    point_limit: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assign each point to its nearest node; per node, keep up to
    ``point_limit`` nearest *owned* points (reference :61-107).

    Args:
      points: (N, 3) padded fine points.
      points_mask: (N,) bool validity of points.
      nodes: (M, 3) padded nodes.
      nodes_mask: (M,) bool validity of nodes (invalid nodes own nothing).
      point_limit: static patch size K.

    Returns:
      point_to_node: (N,) int32 owning node per point (garbage for invalid
        points — mask with points_mask).
      node_masks: (M,) bool — node valid AND owns >= 1 point.
      node_knn_indices: (M, K) int32 into points, sentinel N where missing.
      node_knn_masks: (M, K) bool.
    """
    n = points.shape[0]
    m = nodes.shape[0]

    sq = pairwise_sq_dist(points, nodes)  # (N, M)
    sq = jnp.where(nodes_mask[None, :], sq, _BIG)

    point_to_node = jnp.argmin(sq, axis=1).astype(jnp.int32)      # (N,)
    point_dist = jnp.min(sq, axis=1)                              # (N,)

    # Patch extraction by (owner, distance) sort instead of a per-node
    # masked top-k over the full (M, N) matrix: O(N log N) on-device sort,
    # ~10x cheaper at KITTI sizes, identical result (k nearest owned points,
    # ascending distance).
    owner_key = jnp.where(points_mask, point_to_node, m)           # invalid -> sort last
    s_owner, s_dist, s_idx = jax.lax.sort(
        (owner_key, point_dist, jnp.arange(n, dtype=jnp.int32)), num_keys=2
    )
    pos = jnp.arange(n, dtype=jnp.int32)
    changed = jnp.concatenate(
        [jnp.ones((1,), bool), s_owner[1:] != s_owner[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(changed, pos, 0))
    rank = pos - seg_start

    slot_valid = (s_owner < m) & (rank < point_limit)
    scatter_owner = jnp.where(slot_valid, s_owner, m)
    scatter_rank = jnp.where(slot_valid, rank, 0)

    node_knn_indices = jnp.full((m + 1, point_limit), n, dtype=jnp.int32)
    node_knn_indices = node_knn_indices.at[scatter_owner, scatter_rank].set(
        s_idx, mode="drop"
    )[:m]
    node_knn_masks = node_knn_indices < n

    node_masks = jnp.any(node_knn_masks, axis=1) & nodes_mask

    return point_to_node, node_masks, node_knn_indices, node_knn_masks
