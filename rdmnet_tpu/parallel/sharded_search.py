"""Intra-op (sequence-parallel) sharding for the neighbor search.

Scale-out story beyond data parallelism: on a pod slice, the graph build's
dominant cost — the level-0-scale radius searches — shards over a mesh axis
by QUERY CHUNKS. Support points are replicated (a few MB per level, far
under HBM), each device computes the banded search for its contiguous
x-sorted query shard, and the sharded output feeds equally sharded gathers
downstream; no collective is needed until features are reduced. This is the
`sp` axis of the TPU-native design (DESIGN.md scaling story): latency
scaling for ONE pair, orthogonal to the `dp` batch axis.

The reference has no equivalent — its neighbor search is single-threaded
CPU per DataLoader worker (nanoflann kd-tree,
geotransformer/extensions/cpu/radius_neighbors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from rdmnet_tpu.ops.radius_search import radius_knn, radius_knn_banded


def sharded_radius_knn(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    s_count: jnp.ndarray,
    radius: float,
    k: int,
    mesh: Mesh,
    axis: str = "sp",
    q_count: jnp.ndarray | None = None,
    cell: float | None = None,
    band_cap: int | None = None,
    chunk_size: int = 512,
    approx_recall: float | None = None,
    map_batch: int | None = None,
    return_overflow: bool = False,
):
    """Radius-kNN with queries sharded over ``mesh[axis]``.

    Args mirror ops.radius_search.radius_knn / radius_knn_banded; pass
    ``cell`` + ``band_cap`` to use the banded kernel per shard (queries are
    x-sorted, so contiguous shards stay spatially tight and each device's
    bands cover only its own slab of the scan). With ``return_overflow``
    the banded kernel's band-overflow telemetry is summed over shards
    (0 when unbanded) so the pyramid's `dropped` counters stay honest
    under sharding.

    Returns (Q, k) int32 — sharded over ``axis`` on the way out, usable
    directly by equally-sharded downstream gathers or gathered by XLA when
    consumed with a replicated layout.
    """
    q = q_points.shape[0]
    n = mesh.shape[axis]
    pad = (-q) % n
    q_pad = jnp.pad(q_points, ((0, pad), (0, 0)), constant_values=1.0e9)
    if q_count is None:
        q_valid = jnp.ones((q,), bool)
    else:
        q_valid = jnp.arange(q, dtype=jnp.int32) < q_count
    q_valid = jnp.pad(q_valid, (0, pad))

    def local(q_shard, valid_shard, s_pts, s_cnt):
        if band_cap is not None and cell is not None:
            tab, ov = radius_knn_banded(
                q_shard, s_pts, s_cnt, radius, k,
                cell=cell, band_cap=band_cap, q_valid=valid_shard,
                chunk_size=chunk_size, approx_recall=approx_recall,
                map_batch=map_batch, return_overflow=True,
            )
        else:
            tab = radius_knn(
                q_shard, s_pts, s_cnt, radius, k,
                chunk_size=chunk_size, approx_recall=approx_recall,
                map_batch=map_batch,
            )
            ov = jnp.int32(0)
        return tab, ov[None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_rep=False,
    )
    out, overflow = fn(q_pad, q_valid, s_points, s_count)
    out = out[:q]
    if return_overflow:
        return out, jnp.sum(overflow).astype(jnp.int32)
    return out
