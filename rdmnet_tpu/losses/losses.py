"""RDMNet training losses — fully on-device, masked static shapes.

Re-design of reference experiments/loss.py:10-334. Changes forced by the
TPU-first design:

* GT correspondence labels come from on-device masked distance ops instead
  of scipy cKDTree host round-trips (reference loss.py:92,151);
* every reduction is masked (pads excluded);
* GT node correspondences arrive as the dense overlap matrix produced by
  the model (see rdmnet_tpu/ops/correspondences.py).

All losses are plain callables over (output_dict, batch); they carry no
parameters.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rdmnet_tpu.config import Config
from rdmnet_tpu.graph.pyramid import PairBatch
from rdmnet_tpu.losses.circle_loss import weighted_circle_loss
from rdmnet_tpu.ops.correspondences import radius_correspondence_masks
from rdmnet_tpu.ops.geometry import apply_transform, masked_mean, pairwise_sq_dist

_BIG = 1.0e12
_SQRT_EPS = 1e-12  # sqrt(0) has an infinite gradient; every loss-side sqrt
                   # is guarded so exact-zero distances (perfect matches)
                   # cannot NaN the backward pass


def _weighted_bce(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray, eps=1e-7):
    """Class-balanced BCE (reference loss.py:46-58) over valid entries."""
    v = valid.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(v), 1.0)
    w_neg = jnp.sum(gt * v) / n
    w_pos = 1.0 - w_neg
    pred = jnp.clip(pred, eps, 1.0 - eps)
    bce = -(gt * jnp.log(pred) + (1.0 - gt) * jnp.log(1.0 - pred))
    weights = jnp.where(gt >= 0.5, w_pos, w_neg)
    return jnp.sum(weights * bce * v) / n


class CoarseMatchingLoss:
    """Weighted circle loss on node feature distances
    (reference loss.py:182-212)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg.coarse_loss

    def __call__(self, out: Dict) -> jnp.ndarray:
        ref_feats = out["ref_feats_c"]
        src_feats = out["src_feats_c"]
        overlaps = out["gt_node_corr_overlaps"]  # (M, N) dense
        pair_valid = out["ref_node_masks"][:, None] & out["src_node_masks"][None, :]

        feat_dists = jnp.sqrt(
            pairwise_sq_dist(ref_feats, src_feats, normalized=True) + _SQRT_EPS
        )
        pos_masks = overlaps > self.cfg.positive_overlap
        neg_masks = overlaps == 0.0
        pos_scales = jnp.sqrt(overlaps * pos_masks.astype(overlaps.dtype))

        return weighted_circle_loss(
            pos_masks,
            neg_masks,
            feat_dists,
            self.cfg.positive_margin,
            self.cfg.negative_margin,
            self.cfg.positive_optimal,
            self.cfg.negative_optimal,
            self.cfg.log_scale,
            pair_valid=pair_valid,
            pos_scales=pos_scales,
        )


class GapLoss:
    """Score-gap hinge on the Sinkhorn matrix (reference loss.py:215-293)."""

    def __init__(self, cfg: Config):
        self.positive_radius = cfg.gap_loss.positive_radius
        self.gamma = cfg.gap_loss.triplet_loss_gamma

    def __call__(self, out: Dict, batch: PairBatch) -> jnp.ndarray:
        ref_pts = out["ref_node_corr_knn_points"]   # (P, K, 3)
        src_pts = out["src_node_corr_knn_points"]
        ref_m = out["ref_node_corr_knn_masks"]      # (P, K)
        src_m = out["src_node_corr_knn_masks"]
        scores = out["matching_scores"]             # (P, K+1, K+1)
        p, k1, _ = scores.shape
        k = k1 - 1

        src_pts = apply_transform(src_pts, batch.transform)
        dists = pairwise_sq_dist(ref_pts, src_pts)  # (P, K, K) squared
        gt_masks = ref_m[:, :, None] & src_m[:, None, :]
        r2 = self.positive_radius**2

        def one_side(dists_side, row_masks, score_rows):
            """dists_side (P, K, K): min over axis 2 selects each row's match.
            score_rows (P, K, K+1): this side's score rows incl. dustbin."""
            min_d = jnp.min(jnp.where(gt_masks, dists_side, _BIG), axis=2)
            argmin = jnp.argmin(jnp.where(gt_masks, dists_side, _BIG), axis=2)
            has_corr = min_d < r2                     # (P, K)
            # label column: the match, or the dustbin when no match
            label = jnp.where(has_corr, argmin, k)    # (P, K) in [0, K]
            pos = -jnp.take_along_axis(score_rows, label[..., None], axis=2)[..., 0]
            # negatives: the K non-label entries of each row (reference takes
            # all-but-label of the K+1 entries -> K columns); masked columns
            # carry -(-1e12) and die in the relu hinge automatically
            neg_all = -score_rows                     # (P, K, K+1)
            onehot = jax.nn.one_hot(label, k1, dtype=bool)
            big = jnp.where(onehot, jnp.inf, neg_all)
            neg = -jnp.sort(-big, axis=2)[:, :, 1:]   # drop the label entry
            gap = pos[..., None] - neg                # (P, K, K)
            hinge = jnp.maximum(gap + self.gamma, 0.0)
            per_row = jnp.log(jnp.sum(hinge, axis=2) + 1.0)
            return masked_mean(per_row, row_masks)

        loss_ref = one_side(dists, ref_m, scores[:, :k, :])
        # source side: transpose so rows index src points
        loss_src = one_side(
            jnp.swapaxes(dists, 1, 2), src_m, jnp.swapaxes(scores, 1, 2)[:, :k, :]
        )
        return 0.5 * (loss_ref + loss_src)


class OverlapLoss:
    """n2p + p2p class-balanced BCE (reference loss.py:112-180),
    labels computed on device."""

    def __init__(self, cfg: Config):
        self.n2p_threshold = cfg.vote.n2p_overlap_threshold
        self.p2p_threshold = cfg.vote.p2p_overlap_threshold

    def __call__(self, out: Dict, batch: PairBatch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        transform = batch.transform
        ref_f = out["ref_points_f"]
        src_f = apply_transform(out["src_points_f"], transform)
        ref_fm = out["ref_mask_f"]
        src_fm = out["src_mask_f"]
        ref_c = out["ref_points_c"]   # original coarse nodes
        src_c = apply_transform(out["src_points_c"], transform)
        ref_cm = out["ref_mask_c"]
        src_cm = out["src_mask_c"]

        # p2p: fine point has a partner in the other cloud within radius
        ref_gt, src_gt = radius_correspondence_masks(
            ref_f, src_f, ref_fm, src_fm, self.p2p_threshold
        )
        p2p_pred = jnp.concatenate([out["src_p2p_scores_c"], out["ref_p2p_scores_c"]])
        p2p_gt = jnp.concatenate([src_gt, ref_gt]).astype(jnp.float32)
        p2p_valid = jnp.concatenate([src_fm, ref_fm])
        p2p_loss = _weighted_bce(p2p_pred, p2p_gt, p2p_valid)

        # n2p: node has a fine point of the other cloud within radius
        ref_n2p, _ = radius_correspondence_masks(
            ref_c, src_f, ref_cm, src_fm, self.n2p_threshold
        )
        src_n2p, _ = radius_correspondence_masks(
            src_c, ref_f, src_cm, ref_fm, self.n2p_threshold
        )
        n2p_pred = jnp.concatenate([out["src_n2p_scores_c"], out["ref_n2p_scores_c"]])
        n2p_gt = jnp.concatenate([src_n2p, ref_n2p]).astype(jnp.float32)
        n2p_valid = jnp.concatenate([src_cm, ref_cm])
        n2p_loss = _weighted_bce(n2p_pred, n2p_gt, n2p_valid)

        return n2p_loss, p2p_loss


class VoteLoss:
    """Masked chamfer between shifted node sets + n2n overlap BCE
    (reference loss.py:36-110)."""

    def __init__(self, cfg: Config):
        self.n2n_threshold = cfg.vote.n2n_overlap_threshold

    def __call__(self, out: Dict, batch: PairBatch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ref_node = out["shifted_ref_points_c"]
        src_node = apply_transform(out["shifted_src_points_c"], batch.transform)
        ref_vm = out["ref_mask_c"]
        src_vm = out["src_mask_c"]
        mask_mat = out["vote_mask_mat"]  # (M, N) mutual-NN mask

        sq = pairwise_sq_dist(ref_node, src_node)
        sq = jnp.where(ref_vm[:, None] & src_vm[None, :], sq, _BIG)
        dist = jnp.sqrt(sq + _SQRT_EPS)

        ref_sel = jnp.any(mask_mat, axis=1)
        src_sel = jnp.any(mask_mat, axis=0)
        forward = masked_mean(jnp.min(dist, axis=1), ref_sel)
        backward = masked_mean(jnp.min(dist, axis=0), src_sel)
        chamfer = forward + backward

        # n2n overlap labels: shifted node has a shifted partner within radius
        ref_gt, src_gt = radius_correspondence_masks(
            ref_node, src_node, ref_vm, src_vm, self.n2n_threshold
        )
        pred = jnp.concatenate([out["src_n2n_scores_c"], out["ref_n2n_scores_c"]])
        gt = jnp.concatenate([src_gt, ref_gt]).astype(jnp.float32)
        valid = jnp.concatenate([src_vm, ref_vm])
        n2n_loss = _weighted_bce(pred, gt, valid)

        return chamfer, n2n_loss


class SingleSideChamferLoss:
    """Keep shifted nodes near their own cloud (reference loss.py:10-34)."""

    def __call__(self, out: Dict) -> jnp.ndarray:
        def side(nodes, node_m, points, point_m):
            sq = pairwise_sq_dist(nodes, points)
            sq = jnp.where(point_m[None, :], sq, _BIG)
            return masked_mean(jnp.sqrt(jnp.min(sq, axis=1) + _SQRT_EPS), node_m)

        ref = side(out["shifted_ref_points_c"], out["ref_mask_c"],
                   out["ref_points_f"], out["ref_mask_f"])
        src = side(out["shifted_src_points_c"], out["src_mask_c"],
                   out["src_points_f"], out["src_mask_f"])
        return 0.5 * (ref + src)


class OverallLoss:
    """Weighted sum of all terms (reference loss.py:295-334)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.coarse_loss = CoarseMatchingLoss(cfg)
        self.gap_loss = GapLoss(cfg)
        self.overlap_loss = OverlapLoss(cfg)
        self.vote_loss = VoteLoss(cfg)
        self.node_on_pc_loss = SingleSideChamferLoss()

    def __call__(self, out: Dict, batch: PairBatch) -> Dict[str, jnp.ndarray]:
        w = self.cfg.loss
        c_loss = self.coarse_loss(out)
        g_loss = self.gap_loss(out, batch)
        n_loss, p_loss = self.overlap_loss(out, batch)

        loss = w.weight_coarse_loss * c_loss + w.weight_gap_loss * g_loss + n_loss + p_loss

        result = {
            "c_loss": c_loss,
            "g_loss": g_loss,
            "n_loss": n_loss,
            "p_loss": p_loss,
        }
        if self.cfg.vote.model_use_vote:
            v_loss, nn_loss = self.vote_loss(out, batch)
            d_loss = self.node_on_pc_loss(out)
            loss = loss + (v_loss + d_loss) * w.weight_vote_loss + nn_loss
            result.update({"v_loss": v_loss, "nn_loss": nn_loss, "d_loss": d_loss})
        result["loss"] = loss
        return result
