"""Coarse (superpoint) matching and training target generation.

Static-shape re-design of reference geotransformer/modules/geotransformer/
{superpoint_matching.py:7-83, superpoint_target.py:6-41}:

* ground-truth node correspondences are carried as a dense (M, N) overlap
  matrix instead of dynamic index lists — every consumer in the reference
  (coarse loss, evaluator) immediately densifies anyway
  (reference loss.py:204-205, loss.py:357-358);
* selection returns fixed-size index arrays plus a validity mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rdmnet_tpu.ops.geometry import pairwise_sq_dist

_NEG = -1.0e9


def superpoint_matching(
    ref_feats: jnp.ndarray,
    src_feats: jnp.ndarray,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    num_correspondences: int,
    dual_normalization: bool = True,
    ref_n2p_scores: jnp.ndarray | None = None,
    src_n2p_scores: jnp.ndarray | None = None,
    n2p_score_threshold: float = 0.1,
    exact: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k superpoint correspondences by dual-normalized feature similarity
    (reference superpoint_matching.py:14-83).

    Args:
      ref_feats/src_feats: (M, C)/(N, C) L2-normalized node features.
      ref_masks/src_masks: (M,)/(N,) bool — node valid AND owns points.
      num_correspondences: static K of returned correspondences.
      ref_n2p_scores/src_n2p_scores: optional overlap-score gating
        (disabled in the reference's default call, model.py:308-311).

    Returns:
      (ref_corr_indices, src_corr_indices, corr_scores, corr_valid),
      each (num_correspondences,).
    """
    matching_scores = jnp.exp(-pairwise_sq_dist(ref_feats, src_feats, normalized=True))
    pair_valid = ref_masks[:, None] & src_masks[None, :]
    matching_scores = jnp.where(pair_valid, matching_scores, 0.0)

    if dual_normalization:
        ref_norm = matching_scores / (
            jnp.sum(matching_scores, axis=1, keepdims=True) + 1e-12
        )
        src_norm = matching_scores / (
            jnp.sum(matching_scores, axis=0, keepdims=True) + 1e-12
        )
        matching_scores = ref_norm * src_norm

    if ref_n2p_scores is not None:
        gate = (ref_n2p_scores > n2p_score_threshold)[:, None] & (
            src_n2p_scores > n2p_score_threshold
        )[None, :]
        matching_scores = jnp.where(gate, matching_scores, 0.0)

    # rank invalid pairs last
    flat = jnp.where(pair_valid, matching_scores, _NEG).reshape(-1)
    if exact:
        corr_scores, corr_indices = jax.lax.top_k(flat, num_correspondences)
    else:
        # the exact windowed top-k emitter SIGABRTs in XLA:TPU when this op
        # is vmapped (f32[1, M*N]); training only logs PIR from this result
        # (GT targets replace it), so approximate selection is safe there
        corr_scores, corr_indices = jax.lax.approx_max_k(
            flat, num_correspondences, recall_target=0.95
        )
    n = src_feats.shape[0]
    ref_corr_indices = (corr_indices // n).astype(jnp.int32)
    src_corr_indices = (corr_indices % n).astype(jnp.int32)
    corr_valid = corr_scores > _NEG / 2
    corr_scores = jnp.where(corr_valid, corr_scores, 0.0)
    return ref_corr_indices, src_corr_indices, corr_scores, corr_valid


def superpoint_target_sample(
    gt_overlaps: jnp.ndarray,
    num_targets: int,
    overlap_threshold: float,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample up to ``num_targets`` GT node correspondences with overlap above
    threshold (reference superpoint_target.py:12-41), uniformly without
    replacement via random-key top-k.

    Args:
      gt_overlaps: (M, N) dense GT overlap matrix (0 where no correspondence).
      key: PRNG key for sampling.

    Returns:
      (ref_indices, src_indices, overlaps, valid), each (num_targets,).
    """
    m, n = gt_overlaps.shape
    eligible = gt_overlaps > overlap_threshold
    noise = jax.random.uniform(key, (m * n,))
    rank = jnp.where(eligible.reshape(-1), noise, _NEG)
    # approx top-k of uniform noise == stratified uniform sample; the exact
    # emitter crashes under vmap on TPU (see superpoint_matching)
    top_vals, idx = jax.lax.approx_max_k(rank, num_targets, recall_target=0.95)
    valid = top_vals > _NEG / 2
    ref_indices = (idx // n).astype(jnp.int32)
    src_indices = (idx % n).astype(jnp.int32)
    overlaps = jnp.where(valid, gt_overlaps.reshape(-1)[idx], 0.0)
    return ref_indices, src_indices, overlaps, valid
