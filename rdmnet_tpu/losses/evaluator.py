"""Evaluation metrics (PIR / IR / RRE / RTE / RR) — on device.

Re-design of reference experiments/loss.py:339-396 (Evaluator) and
geotransformer/modules/registration/metrics.py:47-162.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rdmnet_tpu.config import Config
from rdmnet_tpu.graph.pyramid import PairBatch
from rdmnet_tpu.ops.geometry import (
    apply_transform,
    get_rotation_translation_from_transform,
    masked_mean,
)


def relative_rotation_error(gt_rotations: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """RRE in degrees via the trace formula (reference metrics.py:47-65)."""
    # HIGHEST precision: the bf16 TPU default would bias the measured RRE
    # by ~0.1 deg — comparable to the 0.18 deg accuracy target itself
    mat = jnp.matmul(
        jnp.swapaxes(rotations, -1, -2), gt_rotations,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    trace = mat[..., 0, 0] + mat[..., 1, 1] + mat[..., 2, 2]
    x = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    return 180.0 * jnp.arccos(x) / jnp.pi


def relative_translation_error(gt_translations: jnp.ndarray, translations: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(gt_translations - translations, axis=-1)


def isotropic_transform_error(
    gt_transforms: jnp.ndarray, transforms: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    gt_r, gt_t = get_rotation_translation_from_transform(gt_transforms)
    r, t = get_rotation_translation_from_transform(transforms)
    return relative_rotation_error(gt_r, r), relative_translation_error(gt_t, t)


class Evaluator:
    """reference loss.py:339-396."""

    def __init__(self, cfg: Config):
        self.acceptance_overlap = cfg.eval.acceptance_overlap
        self.acceptance_radius = cfg.eval.acceptance_radius
        self.rre_threshold = cfg.eval.rre_threshold
        self.rte_threshold = cfg.eval.rte_threshold

    def evaluate_coarse(self, out: Dict) -> jnp.ndarray:
        """PIR: fraction of predicted node correspondences that are GT
        (reference :348-365)."""
        gt_map = out["gt_node_corr_overlaps"] > self.acceptance_overlap
        ref_idx = out["ref_node_corr_indices"]
        src_idx = out["src_node_corr_indices"]
        valid = out["node_corr_valid"]
        hits = gt_map[ref_idx, src_idx].astype(jnp.float32)
        return masked_mean(hits, valid)

    def evaluate_fine(self, out: Dict, batch: PairBatch) -> jnp.ndarray:
        """IR: inlier ratio of final dense correspondences (reference :368-375)."""
        ref_corr = out["ref_corr_points"]
        src_corr = apply_transform(out["src_corr_points"], batch.transform)
        dist = jnp.linalg.norm(ref_corr - src_corr, axis=1)
        valid = out["corr_scores"] > 0
        return masked_mean((dist < self.acceptance_radius).astype(jnp.float32), valid)

    def evaluate_registration(self, out: Dict, batch: PairBatch):
        rre, rte = isotropic_transform_error(batch.transform, out["estimated_transform"])
        recall = ((rre < self.rre_threshold) & (rte < self.rte_threshold)).astype(jnp.float32)
        return rre, rte, recall

    def __call__(self, out: Dict, batch: PairBatch, evaling: bool = True) -> Dict[str, jnp.ndarray]:
        result = {"PIR": self.evaluate_coarse(out)}
        if evaling and "estimated_transform" in out:
            rre, rte, recall = self.evaluate_registration(out, batch)
            result.update(
                {
                    "IR": self.evaluate_fine(out, batch),
                    "RRE": rre,
                    "RTE": rte,
                    "RR": recall,
                }
            )
        return result
