"""Padded radius-bounded k-nearest-neighbor search (jittable, static shapes).

TPU-native replacement for the reference's nanoflann kd-tree radius search
(reference: geotransformer/extensions/cpu/radius_neighbors/
radius_neighbors_cpu.cpp:3-91 + the truncating wrapper
geotransformer/modules/ops/radius_search.py:29-49). Semantics preserved:

* for each query, neighbors are the support points within ``radius``,
  **sorted by ascending distance** (the C++ uses sorted search then the
  wrapper truncates columns — so static K here == their ``neighbor_limit``);
* missing neighbors are filled with the sentinel index ``len(s_points)``
  (here: the static support capacity ``S``), the framework-wide padding ABI.

Design: brute-force tiled distance computation on the MXU. A kd-tree is the
right tool on CPU; on TPU a (Q_tile, S) distance matmul + top_k is far faster
and fully fusible. Queries are processed in chunks via lax.map to bound VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1.0e12


def _chunk_knn(q_chunk, s_points, s_sq, s_invalid_col, radius_sq, k, approx_recall):
    """(C, 3) queries vs (S, 3) support -> (C, k) indices sorted by distance."""
    # HIGH (bf16x3) reproduces f32-grade distances at half the MXU passes of
    # HIGHEST; selection only needs ordering within the radius bound.
    qs = jnp.matmul(
        q_chunk,
        s_points.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )
    q_sq = jnp.sum(q_chunk * q_chunk, axis=-1, keepdims=True)
    sq_dist = jnp.maximum(q_sq - 2.0 * qs + s_sq[None, :], 0.0)
    sq_dist = jnp.where(s_invalid_col[None, :], _BIG, sq_dist)
    sq_dist = jnp.where(sq_dist > radius_sq, _BIG, sq_dist)
    # top_k of negated distances -> ascending distance order (C++ parity).
    if approx_recall is None:
        neg_top, idx = jax.lax.top_k(-sq_dist, k)
    else:
        # TPU-accelerated approximate top-k (PartialReduce): much cheaper
        # than exact sort for wide rows; tiny recall loss on the farthest
        # neighbors, which the radius bound makes immaterial.
        neg_top, idx = jax.lax.approx_max_k(
            -sq_dist, k, recall_target=approx_recall
        )
    s_cap = s_points.shape[0]
    return jnp.where(neg_top <= -_BIG, s_cap, idx).astype(jnp.int32)


def radius_knn(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    s_count: jnp.ndarray,
    radius: float,
    k: int,
    chunk_size: int = 2048,
    approx_recall: float | None = None,
) -> jnp.ndarray:
    """Radius-bounded kNN indices of ``q_points`` into ``s_points``.

    Args:
      q_points: (Q, 3) padded queries (invalid query rows produce garbage
        rows of sentinels — callers mask by query validity).
      s_points: (S, 3) padded support points.
      s_count: () int32 number of valid support points.
      radius: search radius.
      k: static neighbor count (columns of the result).
      chunk_size: query rows per tile (VMEM knob).

    Returns:
      (Q, k) int32 indices into s_points; sentinel ``S`` where missing.
    """
    q = q_points.shape[0]
    s = s_points.shape[0]
    if k > s:
        # more neighbor slots than support points: compute with k=s and pad
        inner = radius_knn(q_points, s_points, s_count, radius, s, chunk_size)
        return jnp.pad(inner, ((0, 0), (0, k - s)), constant_values=s)
    if approx_recall is not None and s < 4 * k:
        # too few candidates for a windowed reduction to make sense (and the
        # exact path is cheap here)
        approx_recall = None
    s_invalid = jnp.arange(s, dtype=jnp.int32) >= s_count
    s_sq = jnp.sum(s_points * s_points, axis=-1)
    radius_sq = jnp.asarray(radius * radius, jnp.float32)

    fn = functools.partial(
        _chunk_knn,
        s_points=s_points,
        s_sq=s_sq,
        s_invalid_col=s_invalid,
        radius_sq=radius_sq,
        k=k,
        approx_recall=approx_recall,
    )

    if q <= chunk_size:
        return fn(q_points)

    # Pad queries to a multiple of chunk_size and map over tiles.
    num_chunks = -(-q // chunk_size)
    padded = jnp.pad(q_points, ((0, num_chunks * chunk_size - q), (0, 0)))
    tiles = padded.reshape(num_chunks, chunk_size, 3)
    out = jax.lax.map(fn, tiles)
    return out.reshape(num_chunks * chunk_size, k)[:q]
