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
        # the reference includes EVERY real node — also ones owning no fine
        # point (their overlap row is 0 -> negatives). Only capacity pads
        # (which don't exist in the reference) are excluded, so pair
        # validity is the survivor mask, NOT the owns-a-point node mask.
        pair_valid = out["nodes_ref_valid"][:, None] & out["nodes_src_valid"][None, :]

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
        r2 = self.positive_radius**2

        # ---- ref side (reference loss.py:260-268): per ROW of the score
        # matrix, positives/negatives stay row-aligned.
        # The reference takes the argmin over RAW distances whose invalid
        # slots hold the zero pad row — i.e. the transformed ORIGIN on the
        # src side (model.py:278-281 zero padding). A ref point whose raw
        # nearest is such a pad gets its scattered label killed by gt_masks
        # and lands on the DUSTBIN. Our pads sit at 1e9, so we emulate the
        # reference by substituting each pad slot's distance-to-origin.
        # distance from ref_i to the transformed src pad (= transform @ 0)
        t = batch.transform[:3, 3]
        ref_to_padsq = jnp.sum((ref_pts - t) ** 2, axis=-1)   # (P, K)
        # distance from transformed src_j to the (untransformed) zero ref pad
        src_to_padsq = jnp.sum(src_pts**2, axis=-1)           # (P, K)
        d_emul = jnp.where(src_m[:, None, :], dists, ref_to_padsq[:, :, None])
        d_emul = jnp.where(ref_m[:, :, None], d_emul, _BIG)   # invalid rows: don't care
        ref_min = jnp.min(d_emul, axis=2)
        ref_arg = jnp.argmin(d_emul, axis=2)
        arg_real = jnp.take_along_axis(src_m, ref_arg, axis=1)
        ref_label = jnp.where((ref_min < r2) & arg_real, ref_arg, k)  # (P, K) in [0, K]
        ref_rows = scores[:, :k, :]                       # (P, K, K+1)
        pos = -jnp.take_along_axis(ref_rows, ref_label[..., None], axis=2)[..., 0]
        onehot = jax.nn.one_hot(ref_label, k1, dtype=bool)
        big = jnp.where(onehot, jnp.inf, -ref_rows)
        neg = -jnp.sort(-big, axis=2)[:, :, 1:]           # drop the label entry
        hinge = jnp.maximum(pos[..., None] - neg + self.gamma, 0.0)
        per_row = jnp.log(jnp.sum(hinge, axis=2) + 1.0)
        loss_ref = masked_mean(per_row, ref_m)

        # ---- src side (reference loss.py:270-276): the reference gathers
        # the non-label entries of the (K+1, K) grid in ROW-MAJOR order and
        # reshapes to (K, K) — but src labels are one per COLUMN, so that
        # view scrambles negatives across columns. Deliberately replicated:
        # the published model was trained with exactly this objective. A
        # stable argsort on the label flags reproduces "flatten row-major,
        # drop the K labeled entries, reshape".
        d_emulT = jnp.swapaxes(dists, 1, 2)               # (P, K_src, K_ref)
        d_emulT = jnp.where(ref_m[:, None, :], d_emulT, src_to_padsq[:, :, None])
        d_emulT = jnp.where(src_m[:, :, None], d_emulT, _BIG)
        src_min = jnp.min(d_emulT, axis=2)
        src_arg = jnp.argmin(d_emulT, axis=2)
        arg_real2 = jnp.take_along_axis(ref_m, src_arg, axis=1)
        src_label = jnp.where((src_min < r2) & arg_real2, src_arg, k)  # (P, K) in [0, K]
        grid = -scores[:, :, :k]                          # (P, K+1, K)
        pos2 = jnp.take_along_axis(
            grid, src_label[:, None, :], axis=1
        )[:, 0, :]                                        # (P, K)
        lab = (
            jnp.arange(k1)[None, :, None] == src_label[:, None, :]
        )                                                 # (P, K+1, K)
        flat = grid.reshape(p, k1 * k)
        labf = lab.reshape(p, k1 * k)
        order = jnp.argsort(labf, axis=1, stable=True)    # non-labels first
        neg2 = jnp.take_along_axis(flat, order[:, : k * k], axis=1)
        neg2 = neg2.reshape(p, k, k)                      # scrambled (row r, t)
        # positives are gathered by the same row-major boolean indexing, so
        # their sequence is ordered by (label_row, col), not by col — pair
        # sequence position t with negatives column t, as the reference does
        key = src_label * k + jnp.arange(k, dtype=src_label.dtype)[None, :]
        perm = jnp.argsort(key, axis=1)
        pos2_seq = jnp.take_along_axis(pos2, perm, axis=1)
        col_valid_seq = jnp.take_along_axis(src_m, perm, axis=1)
        hinge2 = jnp.maximum(pos2_seq[:, None, :] - neg2 + self.gamma, 0.0)
        per_t = jnp.log(jnp.sum(hinge2, axis=1) + 1.0)    # (P, K)
        loss_src = masked_mean(per_t, col_valid_seq)

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
