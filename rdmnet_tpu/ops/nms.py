"""Greedy sequential radius NMS over nodes (static shapes, on device).

Reimplements the reference's order-dependent greedy NMS
(reference: rdmnet/vote/vote.py:6-40): walk nodes in index order, keep node i
iff no already-kept node lies within ``radius``. The reference runs a Python
loop over a CPU kd-tree result; here the (M, M) adjacency is computed on the
MXU and the (inherently sequential) greedy scan is a lax.fori_loop of M
cheap (M,)-vector steps — M is the coarse node count (~hundreds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rdmnet_tpu.ops.geometry import pairwise_sq_dist


def greedy_nms(
    nodes: jnp.ndarray,
    nodes_mask: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """Greedy keep-if-no-kept-neighbor suppression.

    Args:
      nodes: (M, 3) padded node positions.
      nodes_mask: (M,) bool validity.
      radius: suppression radius.

    Returns:
      keep: (M,) bool — True for surviving valid nodes. Exactly matches the
      reference's sequential semantics (vote.py:36-39) including order
      dependence.
    """
    m = nodes.shape[0]
    sq = pairwise_sq_dist(nodes, nodes)
    adj = sq <= radius * radius
    adj = adj & nodes_mask[None, :] & nodes_mask[:, None]
    # self-adjacency is irrelevant: keep[i] is False while i is examined
    adj = adj & ~jnp.eye(m, dtype=bool)
    adj_f = adj.astype(jnp.float32)

    def body(i, keep):
        blocked = jnp.dot(adj_f[i], keep.astype(jnp.float32)) > 0.0
        return keep.at[i].set(nodes_mask[i] & ~blocked)

    keep = jnp.zeros((m,), dtype=bool)
    return jax.lax.fori_loop(0, m, body, keep)
