"""RDMNet flagship model — full forward pass, static shapes, unbatched pair.

Re-design of reference experiments/model.py:26-404 (RDMNet.forward traced in
SURVEY.md §3.2). One registration pair per call; batch via jax.vmap of
``model.apply`` (batch 1 should skip vmap — see engine/train_step.py). The
(ref, src) clouds run through ONE shared-weight backbone sequentially:
batched gathers under vmap are measurably slower on TPU than two unbatched
passes.

Static-mode flags (Python bools -> separate compiled graphs, like the
reference's training/testing branches):
  * ``training``  — swap coarse matching for sampled GT targets, skip LGR;
  * ``with_gt``   — compute GT overlap/vote-mask targets (off for pure
    inference; reference experiments/model_infer.py is the GT-free variant).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdmnet_tpu.config import Config
from rdmnet_tpu.graph.pyramid import PairBatch, stack_pair_graph
from rdmnet_tpu.nn.backbone import Decoder, Encoder
from rdmnet_tpu.nn.matching import superpoint_matching, superpoint_target_sample
from rdmnet_tpu.nn.sinkhorn import LearnableLogOptimalTransport
from rdmnet_tpu.nn.geotransformer import GeometricTransformer
from rdmnet_tpu.nn.thdroformer import APETransformer, ThDRoFormer
from rdmnet_tpu.nn.vote import VoteLayer
from rdmnet_tpu.ops.correspondences import (
    mutual_nearest_node_masks,
    node_correspondence_overlaps,
)
from rdmnet_tpu.ops.geometry import take_padded
from rdmnet_tpu.ops.lgr import local_to_global_registration
from rdmnet_tpu.ops.nms import greedy_nms
from rdmnet_tpu.ops.partition import point_to_node_partition


def _coarse_transformer(cfg: Config, stage: int, dtype):
    """Coarse transformer family selector (cfg.model.coarse_module):
    stage 1 runs on the encoder's coarse features, stage 2 on the voted
    NMS-survivor nodes. All variants share the call signature
    ``(ref_points, src_points, ref_feats, src_feats, ref_valid, src_valid)``.
    """
    kind = cfg.model.coarse_module
    td = cfg.thdroformer
    in_dim = td.input_dim if stage == 1 else td.input_dim2
    layers = td.num_layers if stage == 1 else td.num_layers2
    name = "transformer" if stage == 1 else "transformer2"
    if kind == "thdroformer":
        return ThDRoFormer(
            in_dim, td.output_dim, td.hidden_dim, td.num_heads, layers,
            k=None if stage == 1 else td.k2, dtype=dtype, name=name,
        )
    if kind == "geotransformer":
        g = cfg.geotransformer
        return GeometricTransformer(
            in_dim, g.output_dim, g.hidden_dim, g.num_heads, g.blocks,
            g.sigma_d, g.sigma_a, g.angle_k, g.reduction_a, name=name,
        )
    if kind == "ape":
        return APETransformer(
            in_dim, td.output_dim, td.hidden_dim, td.num_heads, layers,
            name=name,
        )
    raise ValueError(f"unknown coarse_module {kind!r}")


class RDMNet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(
        self,
        batch: PairBatch,
        training: bool = False,
        with_gt: bool = True,
        target_key: Optional[jax.Array] = None,
        use_pallas_sinkhorn: Optional[bool] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        out: Dict[str, Any] = {}

        ref_pyr, src_pyr = batch.ref, batch.src
        coarse = ref_pyr.num_stages - 1
        fine = 1  # decoder output level (reference model.py:117,121)

        ref_points_c = ref_pyr.points[coarse]
        src_points_c = src_pyr.points[coarse]
        ref_points_f = ref_pyr.points[fine]
        src_points_f = src_pyr.points[fine]
        ref_mask_c = ref_pyr.mask(coarse)
        src_mask_c = src_pyr.mask(coarse)
        ref_mask_f = ref_pyr.mask(fine)
        src_mask_f = src_pyr.mask(fine)

        out["ref_points_c"] = ref_points_c      # original coarse nodes
        out["src_points_c"] = src_points_c
        out["ref_points_f"] = ref_points_f
        out["src_points_f"] = src_points_f
        out["ref_mask_c"] = ref_mask_c
        out["src_mask_c"] = src_mask_c
        out["ref_mask_f"] = ref_mask_f
        out["src_mask_f"] = src_mask_f

        # ---------------- backbone on the statically stacked pair ----------
        # ONE encoder pass over the concatenated [ref; src] graph — not per
        # cloud, and not nn.vmap (batched gathers under vmap are ~2.8x slower
        # on TPU, measured). This reproduces the reference's stacked-cloud
        # semantics exactly: GroupNorm statistics are shared across the pair
        # (reference runs the backbone on the stacked batch,
        # experiments/model_infer.py:146, geotransformer/modules GroupNorm
        # over the full point axis) — verified by the end-to-end golden test.
        graph = stack_pair_graph(ref_pyr, src_pyr)
        cap_c = ref_points_c.shape[0]
        cap_f = ref_points_f.shape[0]
        encoder = Encoder(cfg.backbone, dtype=dtype, name="encoder")
        feats_in = jnp.concatenate([batch.ref_feats, batch.src_feats], axis=0)
        feats_list = encoder(feats_in, graph)
        feats_c = feats_list[-1].reshape(2, cap_c, -1)  # (2, cap_c, 2048)

        # ---------------- transformer #1 on original coarse nodes ----------
        ref_feats_c, src_feats_c = _coarse_transformer(cfg, 1, dtype)(
            ref_points_c, src_points_c, feats_c[0], feats_c[1],
            ref_valid=ref_mask_c, src_valid=src_mask_c,
        )

        # n2p score head (reference model.py:76,160-166)
        proj_n2p = nn.Dense(1, name="proj_n2p_score")
        ref_n2p_logit = proj_n2p(ref_feats_c)
        src_n2p_logit = proj_n2p(src_feats_c)
        out["ref_n2p_scores_c"] = jax.nn.sigmoid(ref_n2p_logit[:, 0])
        out["src_n2p_scores_c"] = jax.nn.sigmoid(src_n2p_logit[:, 0])

        # ---------------- decoder with score channel -----------------------
        # same stacked-pair pass as the encoder (shared GroupNorm statistics)
        decoder = Decoder(cfg.backbone, dtype=dtype, name="decoder")
        coarse_cond = jnp.concatenate(
            [
                jnp.concatenate([ref_feats_c, ref_n2p_logit], axis=1),
                jnp.concatenate([src_feats_c, src_n2p_logit], axis=1),
            ],
            axis=0,
        )
        dec = decoder(list(feats_list[:-1]) + [coarse_cond], graph)
        dec_f = dec[0].reshape(2, cap_f, -1)
        ref_feats_f = dec_f[0][:, :-1]          # (cap_f, output_dim)
        src_feats_f = dec_f[1][:, :-1]
        out["ref_feats_f"] = ref_feats_f
        out["src_feats_f"] = src_feats_f
        out["ref_p2p_scores_c"] = jax.nn.sigmoid(dec_f[0][:, -1])
        out["src_p2p_scores_c"] = jax.nn.sigmoid(dec_f[1][:, -1])

        # ---------------- vote branch --------------------------------------
        use_vote = cfg.vote.model_use_vote and cfg.vote.inference_use_vote
        if cfg.vote.model_use_vote:
            if with_gt:
                # mutual-NN node mask for the vote loss
                # (reference model.py:184-190)
                out["vote_mask_mat"] = mutual_nearest_node_masks(
                    ref_points_c, src_points_c, batch.transform,
                    cfg.model.ground_truth_corres_radius,
                    ref_mask_c, src_mask_c,
                )

            vote = VoteLayer(cfg.vote, ref_feats_c.shape[-1], name="vote")
            feats_c_pair = jnp.stack([ref_feats_c, src_feats_c])
            points_c_pair = jnp.stack([ref_points_c, src_points_c])
            shifted_pair, voted_feats = vote(points_c_pair, feats_c_pair)
            # keep pad rows at their far-away sentinel positions
            mask_pair = jnp.stack([ref_mask_c, src_mask_c])
            shifted_pair = jnp.where(
                mask_pair[..., None], shifted_pair, points_c_pair
            )
            out["shifted_ref_points_c"] = shifted_pair[0]
            out["shifted_src_points_c"] = shifted_pair[1]

            proj_n2n = nn.Dense(1, name="proj_n2n_score")
            n2n_logits = proj_n2n(voted_feats)[..., 0]
            out["ref_n2n_scores_c"] = jax.nn.sigmoid(n2n_logits[0])
            out["src_n2n_scores_c"] = jax.nn.sigmoid(n2n_logits[1])

        if use_vote:
            keep_pair = jax.vmap(
                lambda n, m: greedy_nms(
                    n, m, cfg.vote.nms_radius,
                    neighbor_limit=cfg.vote.nms_neighbor_limit,
                )
            )(shifted_pair, mask_pair)
            node_valid = mask_pair & keep_pair          # (2, cap_c)
            nodes_pair = shifted_pair

            ref_feats_c, src_feats_c = _coarse_transformer(cfg, 2, dtype)(
                nodes_pair[0], nodes_pair[1], voted_feats[0], voted_feats[1],
                ref_valid=node_valid[0], src_valid=node_valid[1],
            )
        else:
            nodes_pair = jnp.stack([ref_points_c, src_points_c])
            node_valid = jnp.stack([ref_mask_c, src_mask_c])

        # final node set used by matching (reference selects survivors;
        # we keep static shape + validity mask)
        out["nodes_ref"] = nodes_pair[0]
        out["nodes_src"] = nodes_pair[1]
        out["nodes_ref_valid"] = node_valid[0]
        out["nodes_src_valid"] = node_valid[1]

        ref_feats_c_norm = ref_feats_c / (
            jnp.linalg.norm(ref_feats_c, axis=1, keepdims=True) + 1e-12
        )
        src_feats_c_norm = src_feats_c / (
            jnp.linalg.norm(src_feats_c, axis=1, keepdims=True) + 1e-12
        )
        out["ref_feats_c"] = ref_feats_c_norm
        out["src_feats_c"] = src_feats_c_norm

        # ---------------- point-to-node partition --------------------------
        _, ref_node_masks, ref_knn_indices, ref_knn_masks = point_to_node_partition(
            ref_points_f, ref_mask_f, nodes_pair[0], node_valid[0],
            cfg.model.num_points_in_patch,
        )
        _, src_node_masks, src_knn_indices, src_knn_masks = point_to_node_partition(
            src_points_f, src_mask_f, nodes_pair[1], node_valid[1],
            cfg.model.num_points_in_patch,
        )
        ref_knn_points = take_padded(ref_points_f, ref_knn_indices)  # (M, K, 3)
        src_knn_points = take_padded(src_points_f, src_knn_indices)
        out["ref_node_masks"] = ref_node_masks
        out["src_node_masks"] = src_node_masks

        # ---------------- GT node correspondences --------------------------
        if with_gt:
            gt_overlaps = node_correspondence_overlaps(
                nodes_pair[0], nodes_pair[1],
                ref_knn_points, src_knn_points,
                batch.transform, cfg.model.ground_truth_matching_radius,
                ref_node_masks, src_node_masks,
                ref_knn_masks, src_knn_masks,
            )
            out["gt_node_corr_overlaps"] = gt_overlaps

        # ---------------- coarse matching ----------------------------------
        ref_corr, src_corr, corr_scores, corr_valid = superpoint_matching(
            jax.lax.stop_gradient(ref_feats_c_norm),
            jax.lax.stop_gradient(src_feats_c_norm),
            ref_node_masks, src_node_masks,
            cfg.coarse_matching.num_correspondences,
            cfg.coarse_matching.dual_normalization,
            exact=not training,
        )
        out["ref_node_corr_indices"] = ref_corr
        out["src_node_corr_indices"] = src_corr
        out["node_corr_valid"] = corr_valid

        if training:
            assert with_gt and target_key is not None
            ref_corr, src_corr, corr_scores, corr_valid = superpoint_target_sample(
                gt_overlaps,
                cfg.coarse_matching.num_targets,
                cfg.coarse_matching.overlap_threshold,
                target_key,
            )

        # ---------------- patch gather + optimal transport -----------------
        p_ref_knn_idx = ref_knn_indices[ref_corr]       # (P, K)
        p_src_knn_idx = src_knn_indices[src_corr]
        p_ref_knn_masks = ref_knn_masks[ref_corr] & corr_valid[:, None]
        p_src_knn_masks = src_knn_masks[src_corr] & corr_valid[:, None]
        p_ref_knn_points = ref_knn_points[ref_corr]     # (P, K, 3)
        p_src_knn_points = src_knn_points[src_corr]
        p_ref_knn_feats = take_padded(ref_feats_f, p_ref_knn_idx)  # (P, K, C)
        p_src_knn_feats = take_padded(src_feats_f, p_src_knn_idx)

        out["ref_node_corr_knn_points"] = p_ref_knn_points
        out["src_node_corr_knn_points"] = p_src_knn_points
        out["ref_node_corr_knn_masks"] = p_ref_knn_masks
        out["src_node_corr_knn_masks"] = p_src_knn_masks

        sim = jnp.einsum(
            "pkc,plc->pkl", p_ref_knn_feats, p_src_knn_feats,
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.asarray(ref_feats_f.shape[1], jnp.float32))
        if use_pallas_sinkhorn is None:
            use_pallas_sinkhorn = not training  # autodiff needs the scan path
        matching_scores = LearnableLogOptimalTransport(
            cfg.model.num_sinkhorn_iterations, name="optimal_transport"
        )(sim, p_ref_knn_masks, p_src_knn_masks, use_pallas=use_pallas_sinkhorn)
        out["matching_scores"] = matching_scores        # (P, K+1, K+1)

        # ---------------- local-to-global registration ---------------------
        if not training:
            corr, transform = local_to_global_registration(
                p_ref_knn_points, p_src_knn_points,
                p_ref_knn_masks, p_src_knn_masks,
                jax.lax.stop_gradient(matching_scores),
                corr_valid, cfg.fine_matching,
                node_corr_scores=corr_scores,
            )
            out["ref_corr_points"] = corr.ref_points
            out["src_corr_points"] = corr.src_points
            out["corr_scores"] = corr.scores
            out["estimated_transform"] = transform

        return out
