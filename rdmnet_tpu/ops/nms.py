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
      keep: (M,) bool — True for surviving valid nodes. Matches the
      reference's sequential greedy semantics (vote.py:36-39) including
      order dependence, over the FULL radius adjacency. Known divergence:
      the reference sees its adjacency through radius_search, which truncates
      each node to the calibrated neighbor limit — a node in a cluster
      denser than that limit can escape suppression there while this exact
      adjacency suppresses it. The golden end-to-end test observes identical
      survivor sets on real scans; the difference can only appear in
      clusters exceeding the reference's neighbor limit.
    """
    m = nodes.shape[0]
    sq = pairwise_sq_dist(nodes, nodes)
    # STRICT inequality: the reference's adjacency comes from nanoflann,
    # whose RadiusResultSet admits dist < radius (nanoflann.hpp:250) — a
    # node pair at exactly the NMS radius must NOT suppress
    adj = sq < radius * radius
    adj = adj & nodes_mask[None, :] & nodes_mask[:, None]
    # self-adjacency is irrelevant: a node never blocks itself
    adj = adj & ~jnp.eye(m, dtype=bool)
    adj_f = adj.astype(jnp.float32)
    # adjacency restricted to earlier-indexed neighbors (strict lower triangle)
    earlier = jnp.tril(jnp.ones((m, m), bool), k=-1)
    adj_earlier_f = (adj & earlier).astype(jnp.float32)

    # Parallel peeling: the greedy result is the lexicographically-first
    # maximal independent set — a node is kept iff it has no earlier-indexed
    # kept neighbor. Each round confirms every still-active node with no
    # earlier-indexed active neighbor (greedy must keep those), then kills
    # their active neighbors. Rounds needed = suppression-chain depth
    # (typically < 10), vs M sequential steps for the naive loop.
    def cond(state):
        _, active = state
        return jnp.any(active)

    def body(state):
        keep, active = state
        a = active.astype(jnp.float32)
        has_earlier_active = (adj_earlier_f @ a) > 0.0
        confirm = active & ~has_earlier_active
        killed = (adj_f @ confirm.astype(jnp.float32)) > 0.0
        keep = keep | confirm
        active = active & ~confirm & ~killed
        return keep, active

    keep0 = jnp.zeros((m,), dtype=bool)
    keep, _ = jax.lax.while_loop(cond, body, (keep0, nodes_mask))
    return keep
