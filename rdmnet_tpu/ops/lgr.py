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
    """Static top-k row/column extraction with dustbin comparison
    (reference compute_correspondence_matrix, :49-91).

    General ``cfg.topk``/``cfg.mutual`` semantics: the ref side selects the
    top-k entries per row (dustbin column included in the ranking — it can
    never pass its own keep test), the src side per column; ``mutual=False``
    takes the union (duplicates removed), ``mutual=True`` the intersection.
    The result is a static (P, 2*K*topk) — or (P, K*topk) when mutual —
    correspondence set; absent entries carry zero weight. Ties at the k-th
    score are broken by index as in the reference's topk.
    """
    p, k1, _ = scores.shape
    k = k1 - 1
    t = cfg.topk
    assert 1 <= t <= k, f"fine_matching.topk={t} out of range [1, {k}]"
    mask_mat = ref_knn_masks[:, :, None] & src_knn_masks[:, None, :]  # (P, K, K)

    dust_col = scores[:, :k, k]   # (P, K) per-row dustbin score
    dust_row = scores[:, k, :k]   # (P, K) per-col dustbin score

    # row side: top-t per row (reference :57-64). With the dustbin the
    # ranking runs over the (K+1)-wide row (the reference keeps the dustbin
    # in the candidate set and compares against it); WITHOUT the dustbin the
    # reference matrix has no dustbin column at all, so ranking over K+1
    # entries would let the dustbin evict a real body entry from the top-t.
    if cfg.use_dustbin:
        row_vals, row_idx = jax.lax.top_k(scores[:, :k, :], t)   # (P, K, t)
        row_keep = (row_idx < k) & (row_vals > dust_col[..., None])
    else:
        row_vals, row_idx = jax.lax.top_k(scores[:, :k, :k], t)  # (P, K, t)
        row_keep = row_vals > cfg.confidence_threshold
    row_j = jnp.minimum(row_idx, k - 1)                          # (P, K, t)

    # col side: top-t per column (reference :68-78), same dustbin rule
    if cfg.use_dustbin:
        col_vals, col_idx = jax.lax.top_k(
            jnp.swapaxes(scores[:, :, :k], 1, 2), t              # (P, K, K+1)
        )                                                        # (P, K, t) per col j
        col_keep = (col_idx < k) & (col_vals > dust_row[..., None])
    else:
        col_vals, col_idx = jax.lax.top_k(
            jnp.swapaxes(scores[:, :k, :k], 1, 2), t
        )
        col_keep = col_vals > cfg.confidence_threshold
    col_i = jnp.minimum(col_idx, k - 1)                          # (P, K, t)

    # mask/validity gates (reference :86-89)
    def gather_mask(mm, i_idx, j_idx):
        # mm (K, K) gathered at per-entry (i, j) index arrays of equal shape
        return mm[i_idx, j_idx]

    rows_i = jnp.broadcast_to(jnp.arange(k)[:, None], (k, t))
    row_keep &= jax.vmap(gather_mask)(mask_mat, jnp.broadcast_to(rows_i, row_j.shape), row_j)
    col_keep &= jax.vmap(gather_mask)(mask_mat, col_i, jnp.broadcast_to(rows_i, col_i.shape))
    row_keep &= corr_valid[:, None, None]
    col_keep &= corr_valid[:, None, None]

    if cfg.mutual:
        # intersection: a row-side entry (i, j) survives iff the col side of
        # column j also selected row i — the col side then contributes only
        # duplicates, so the set is the row side alone (reference :81-82 AND)
        def row_in_col(ci, ck, rj, rk):
            # ci/ck (K, t) col-side per column; rj/rk (K, t) row-side per row
            ci_at = ci[rj]            # (K, t, t): col selections of column rj
            ck_at = ck[rj]
            member = jnp.any(
                (ci_at == jnp.arange(k)[:, None, None]) & ck_at, axis=-1
            )                          # (K, t)
            return rk & member

        row_keep = jax.vmap(row_in_col)(col_i, col_keep, row_j, row_keep)
        col_keep = jnp.zeros_like(col_keep)
    else:
        # union: drop col-side entries the row side already selected
        # (reference materializes one boolean matrix; here: (i=col_i, j) is a
        # duplicate iff the row side kept (i, j))
        def col_dup(ci, rj, rk):
            rj_at = rj[ci]            # (K, t, t): row selections of row ci
            rk_at = rk[ci]
            return jnp.any(
                (rj_at == jnp.arange(k)[:, None, None]) & rk_at, axis=-1
            )                          # (K, t)

        col_keep &= ~jax.vmap(col_dup)(col_i, row_j, row_keep)

    row_w = jnp.where(row_keep, row_vals, 0.0)
    col_w = jnp.where(col_keep, col_vals, 0.0)

    # gather the point pairs; row side: (i, row_j[i, u]), col side: (col_i, j)
    row_ref = jnp.repeat(ref_knn_points, t, axis=1)              # (P, K*t, 3)
    row_src = jnp.take_along_axis(
        src_knn_points, row_j.reshape(p, k * t)[..., None], axis=1
    )
    if cfg.mutual:
        ref_pts, src_pts = row_ref, row_src
        weights = row_w.reshape(p, k * t)
    else:
        col_ref = jnp.take_along_axis(
            ref_knn_points, col_i.reshape(p, k * t)[..., None], axis=1
        )
        col_src = jnp.repeat(src_knn_points, t, axis=1)
        ref_pts = jnp.concatenate([row_ref, col_ref], axis=1)    # (P, 2Kt, 3)
        src_pts = jnp.concatenate([row_src, col_src], axis=1)
        weights = jnp.concatenate(
            [row_w.reshape(p, k * t), col_w.reshape(p, k * t)], axis=1
        )

    counts = jnp.sum((weights > 0).astype(jnp.int32), axis=1)    # (P,)

    c = weights.shape[1]
    corr = Correspondences(
        ref_points=ref_pts.reshape(p * c, 3),
        src_points=src_pts.reshape(p * c, 3),
        scores=weights.reshape(p * c),
        patch_ids=jnp.repeat(jnp.arange(p, dtype=jnp.int32), c),
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
    cpp = corr.scores.shape[0] // p   # static per-patch entry count

    # --- verification set: optionally the top `correspondence_limit` entries
    # by score (reference :153-160); hypotheses still come from ALL entries
    if cfg.correspondence_limit is not None and cfg.correspondence_limit < p * cpp:
        ver_scores, sel = jax.lax.top_k(corr.scores, cfg.correspondence_limit)
        ver = Correspondences(
            ref_points=corr.ref_points[sel],
            src_points=corr.src_points[sel],
            scores=ver_scores,
            patch_ids=corr.patch_ids[sel],
        )
    else:
        ver = corr

    # --- local hypotheses: per-patch weighted Procrustes over its entries
    ref_b = corr.ref_points.reshape(p, cpp, 3)
    src_b = corr.src_points.reshape(p, cpp, 3)
    w_b = corr.scores.reshape(p, cpp)
    hyp_transforms = weighted_procrustes(src_b, ref_b, w_b)       # (P, 4, 4)
    hyp_ok = counts >= cfg.correspondence_threshold               # (P,)

    # fallback hypothesis from all correspondences (reference degenerate
    # branch, :187-192) — only eligible when no patch hypothesis is valid
    global_tf = weighted_procrustes(ver.src_points, ver.ref_points, ver.scores)
    all_tfs = jnp.concatenate([hyp_transforms, global_tf[None]], axis=0)  # (P+1, 4, 4)

    # --- hypothesis verification: inlier counts over the verification set
    aligned = apply_transform(ver.src_points[None], all_tfs)       # (P+1, C, 3)
    res = jnp.linalg.norm(ver.ref_points[None] - aligned, axis=-1)
    inlier = (res < cfg.acceptance_radius) & (ver.scores > 0)[None]
    inlier_counts = jnp.sum(inlier.astype(jnp.int32), axis=1)     # (P+1,)
    any_ok = jnp.any(hyp_ok)
    gate = jnp.concatenate([hyp_ok, ~any_ok[None]])
    inlier_counts = jnp.where(gate, inlier_counts, -1)
    best = jnp.argmax(inlier_counts)

    cur_scores = ver.scores * inlier[best].astype(ver.scores.dtype)

    # --- global refinement (reference :194-200)
    transform = weighted_procrustes(ver.src_points, ver.ref_points, cur_scores)
    for _ in range(cfg.num_refinement_steps - 1):
        cur_scores = _inlier_weights(ver, transform, cfg.acceptance_radius)
        transform = weighted_procrustes(ver.src_points, ver.ref_points, cur_scores)

    return corr, transform
