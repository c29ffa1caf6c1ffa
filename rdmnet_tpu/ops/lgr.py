"""Local-to-Global Registration (LGR) — static-shape, fully on device.

Re-design of reference geotransformer/modules/geotransformer/
local_global_registration.py:11-243. The reference extracts a dynamic list
of dense correspondences (torch.nonzero), chunks it on the host, and solves
per-patch Procrustes with CPU SVD. Here:

* with the default ``topk=1`` each patch contributes at most K row-side and
  K column-side correspondences, so the correspondence set is represented
  statically as (P, 2K) entries with zero weights for absent ones — exactly
  the nonzeros of the reference's correspondence matrix (duplicates where
  both sides select the same pair are zeroed on the column side);
* per-patch hypotheses, inlier counting against the full correspondence
  set, and the iterative global refinement are all batched jnp ops with
  native TPU SVD.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rdmnet_tpu.config import FineMatchingConfig
from rdmnet_tpu.ops.geometry import apply_transform
from rdmnet_tpu.ops.procrustes import weighted_procrustes


class Correspondences(NamedTuple):
    """Flat padded correspondence set (C = P * 2K entries)."""

    ref_points: jnp.ndarray   # (C, 3)
    src_points: jnp.ndarray   # (C, 3)
    scores: jnp.ndarray       # (C,) zero = padding
    patch_ids: jnp.ndarray    # (C,) owning patch correspondence


def _extract_correspondences(
    scores: jnp.ndarray,       # (P, K+1, K+1) exp'd OT matrix incl. dustbin
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    corr_valid: jnp.ndarray,   # (P,) patch-correspondence validity
    cfg: FineMatchingConfig,
) -> Tuple[Correspondences, jnp.ndarray]:
    """Row/column top-1 extraction with dustbin comparison
    (reference compute_correspondence_matrix, :49-91, topk=1 path)."""
    p, k1, _ = scores.shape
    k = k1 - 1
    mask_mat = ref_knn_masks[:, :, None] & src_knn_masks[:, None, :]  # (P, K, K)

    body = scores[:, :k, :k]
    dust_col = scores[:, :k, k]   # (P, K) per-row dustbin score
    dust_row = scores[:, k, :k]   # (P, K) per-col dustbin score

    if cfg.use_dustbin:
        # row side: best col including dustbin must beat the dustbin entry
        row_best = jnp.argmax(scores[:, :k, :], axis=2)          # (P, K) in [0, K]
        row_val = jnp.take_along_axis(scores[:, :k, :], row_best[..., None], axis=2)[..., 0]
        row_keep = (row_best < k) & (row_val > dust_col)
        col_best = jnp.argmax(scores[:, :, :k], axis=1)          # (P, K) in [0, K]
        col_val = jnp.take_along_axis(scores[:, :, :k], col_best[:, None, :], axis=1)[:, 0, :]
        col_keep = (col_best < k) & (col_val > dust_row)
    else:
        row_best = jnp.argmax(body, axis=2)
        row_val = jnp.take_along_axis(body, row_best[..., None], axis=2)[..., 0]
        row_keep = row_val > cfg.confidence_threshold
        col_best = jnp.argmax(body, axis=1)
        col_val = jnp.take_along_axis(body, col_best[:, None, :], axis=1)[:, 0, :]
        col_keep = col_val > cfg.confidence_threshold

    row_j = jnp.minimum(row_best, k - 1)
    col_i = jnp.minimum(col_best, k - 1)

    rows = jnp.arange(k)
    row_keep &= jnp.take_along_axis(mask_mat, row_j[..., None], axis=2)[..., 0]
    col_keep &= jnp.take_along_axis(mask_mat, col_i[:, None, :], axis=1)[:, 0, :]
    row_keep &= corr_valid[:, None]
    col_keep &= corr_valid[:, None]

    # column-side entries that the row side already selected are duplicates:
    # (col_i[j], j) duplicated iff row side kept (col_i[j], row_j[col_i[j]] == j)
    row_j_at = jnp.take_along_axis(row_j, col_i, axis=1)        # (P, K)
    row_keep_at = jnp.take_along_axis(row_keep, col_i, axis=1)  # (P, K)
    dup = row_keep_at & (row_j_at == rows[None, :])
    col_keep &= ~dup

    row_w = jnp.where(row_keep, row_val, 0.0)
    col_w = jnp.where(col_keep, col_val, 0.0)

    # gather the point pairs
    row_ref = ref_knn_points                                     # (P, K, 3) index i = row
    row_src = jnp.take_along_axis(src_knn_points, row_j[..., None], axis=1)
    col_ref = jnp.take_along_axis(ref_knn_points, col_i[..., None], axis=1)
    col_src = src_knn_points

    ref_pts = jnp.concatenate([row_ref, col_ref], axis=1)        # (P, 2K, 3)
    src_pts = jnp.concatenate([row_src, col_src], axis=1)
    weights = jnp.concatenate([row_w, col_w], axis=1)            # (P, 2K)

    counts = jnp.sum((weights > 0).astype(jnp.int32), axis=1)    # (P,)

    c = p * 2 * k
    corr = Correspondences(
        ref_points=ref_pts.reshape(c, 3),
        src_points=src_pts.reshape(c, 3),
        scores=weights.reshape(c),
        patch_ids=jnp.repeat(jnp.arange(p, dtype=jnp.int32), 2 * k),
    )
    return corr, counts


def _inlier_weights(corr: Correspondences, transform, radius):
    aligned = apply_transform(corr.src_points, transform)
    res = jnp.linalg.norm(corr.ref_points - aligned, axis=-1)
    return corr.scores * (res < radius).astype(corr.scores.dtype)


def local_to_global_registration(
    ref_knn_points: jnp.ndarray,   # (P, K, 3)
    src_knn_points: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,    # (P, K)
    src_knn_masks: jnp.ndarray,
    matching_scores: jnp.ndarray,  # (P, K+1, K+1) log OT plan
    corr_valid: jnp.ndarray,       # (P,)
    cfg: FineMatchingConfig,
    node_corr_scores: jnp.ndarray | None = None,
) -> Tuple[Correspondences, jnp.ndarray]:
    """Full LGR (reference forward, :204-243 + :145-202).

    Returns the flat correspondence set and the (4, 4) estimated transform.
    """
    scores = jnp.exp(matching_scores)
    corr, counts = _extract_correspondences(
        scores, ref_knn_points, src_knn_points, ref_knn_masks, src_knn_masks,
        corr_valid, cfg,
    )
    if cfg.use_global_score and node_corr_scores is not None:
        per_entry = jnp.repeat(node_corr_scores, corr.scores.shape[0] // node_corr_scores.shape[0])
        corr = corr._replace(scores=corr.scores * per_entry)

    p, k = ref_knn_masks.shape

    # --- local hypotheses: per-patch weighted Procrustes over its 2K entries
    ref_b = corr.ref_points.reshape(p, 2 * k, 3)
    src_b = corr.src_points.reshape(p, 2 * k, 3)
    w_b = corr.scores.reshape(p, 2 * k)
    hyp_transforms = weighted_procrustes(src_b, ref_b, w_b)       # (P, 4, 4)
    hyp_ok = counts >= cfg.correspondence_threshold               # (P,)

    # fallback hypothesis from all correspondences (reference degenerate
    # branch, :187-192) — only eligible when no patch hypothesis is valid
    global_tf = weighted_procrustes(corr.src_points, corr.ref_points, corr.scores)
    all_tfs = jnp.concatenate([hyp_transforms, global_tf[None]], axis=0)  # (P+1, 4, 4)

    # --- hypothesis verification: inlier counts over the full corr set
    aligned = apply_transform(corr.src_points[None], all_tfs)      # (P+1, C, 3)
    res = jnp.linalg.norm(corr.ref_points[None] - aligned, axis=-1)
    inlier = (res < cfg.acceptance_radius) & (corr.scores > 0)[None]
    inlier_counts = jnp.sum(inlier.astype(jnp.int32), axis=1)     # (P+1,)
    any_ok = jnp.any(hyp_ok)
    gate = jnp.concatenate([hyp_ok, ~any_ok[None]])
    inlier_counts = jnp.where(gate, inlier_counts, -1)
    best = jnp.argmax(inlier_counts)

    cur_scores = corr.scores * inlier[best].astype(corr.scores.dtype)

    # --- global refinement (reference :194-200)
    transform = weighted_procrustes(corr.src_points, corr.ref_points, cur_scores)
    for _ in range(cfg.num_refinement_steps - 1):
        cur_scores = _inlier_weights(corr, transform, cfg.acceptance_radius)
        transform = weighted_procrustes(corr.src_points, corr.ref_points, cur_scores)

    return corr, transform
