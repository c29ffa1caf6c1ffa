"""(Weighted) circle loss over a feature-distance matrix.

Re-design of reference geotransformer/modules/loss/circle_loss.py:7-132 with
an explicit pair-validity mask: padded pairs contribute exp(-inf)=0 to the
logsumexp (the reference has no pads; its zero-weight entries contribute
exp(0)=1, which we preserve for *valid* non-pos/non-neg entries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rdmnet_tpu.ops.geometry import masked_mean

_NEG_INF = -1.0e9


def weighted_circle_loss(
    pos_masks: jnp.ndarray,
    neg_masks: jnp.ndarray,
    feat_dists: jnp.ndarray,
    pos_margin: float,
    neg_margin: float,
    pos_optimal: float,
    neg_optimal: float,
    log_scale: float,
    pair_valid: jnp.ndarray | None = None,
    pos_scales: jnp.ndarray | None = None,
    neg_scales: jnp.ndarray | None = None,
) -> jnp.ndarray:
    if pair_valid is None:
        pair_valid = jnp.ones_like(pos_masks)
    pos_masks = pos_masks & pair_valid
    neg_masks = neg_masks & pair_valid

    row_masks = jnp.any(pos_masks, -1) & jnp.any(neg_masks, -1)
    col_masks = jnp.any(pos_masks, -2) & jnp.any(neg_masks, -2)

    pos_weights = feat_dists - 1e5 * (~pos_masks).astype(feat_dists.dtype)
    pos_weights = jnp.maximum(pos_weights - pos_optimal, 0.0)
    if pos_scales is not None:
        pos_weights = pos_weights * pos_scales
    pos_weights = jax.lax.stop_gradient(pos_weights)

    neg_weights = feat_dists + 1e5 * (~neg_masks).astype(feat_dists.dtype)
    neg_weights = jnp.maximum(neg_optimal - neg_weights, 0.0)
    if neg_scales is not None:
        neg_weights = neg_weights * neg_scales
    neg_weights = jax.lax.stop_gradient(neg_weights)

    pos_arg = log_scale * (feat_dists - pos_margin) * pos_weights
    neg_arg = log_scale * (neg_margin - feat_dists) * neg_weights
    # padded pairs must vanish from the logsumexp entirely
    pos_arg = jnp.where(pair_valid, pos_arg, _NEG_INF)
    neg_arg = jnp.where(pair_valid, neg_arg, _NEG_INF)

    loss_pos_row = jax.nn.logsumexp(pos_arg, axis=-1)
    loss_pos_col = jax.nn.logsumexp(pos_arg, axis=-2)
    loss_neg_row = jax.nn.logsumexp(neg_arg, axis=-1)
    loss_neg_col = jax.nn.logsumexp(neg_arg, axis=-2)

    loss_row = jax.nn.softplus(loss_pos_row + loss_neg_row) / log_scale
    loss_col = jax.nn.softplus(loss_pos_col + loss_neg_col) / log_scale

    return 0.5 * (masked_mean(loss_row, row_masks) + masked_mean(loss_col, col_masks))
