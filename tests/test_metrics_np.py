"""Offline numpy metric unit tests (rdmnet_tpu/utils/metrics_np.py)."""

import numpy as np
import pytest

from rdmnet_tpu.utils.metrics_np import (
    compute_registration_error,
    compute_rotation_mse_and_mae,
    modified_chamfer_distance,
)
from rdmnet_tpu.utils.se3_np import euler_zyx_matrix


def rot_z(deg):
    tf = np.eye(4)
    tf[:3, :3] = euler_zyx_matrix(np.radians(deg), 0.0, 0.0)
    return tf


class TestMetricsWraparound:
    def test_rpy_wraps_at_180(self):
        """gt yaw 179.9 vs est -179.9 are 0.2 deg apart — the per-axis
        errors must not report ~359.8 (plain-difference blowup)."""
        gt, est = rot_z(179.9), rot_z(-179.9)
        rre, rte, rx, ry, rz = compute_registration_error(gt, est)
        assert rre == pytest.approx(0.2, abs=1e-3)
        assert rz == pytest.approx(0.2, abs=1e-3)
        assert rx < 1e-3 and ry < 1e-3
        mse, mae = compute_rotation_mse_and_mae(gt[:3, :3], est[:3, :3])
        assert mae == pytest.approx(0.2 / 3, abs=1e-3)

    def test_rpy_plain_small_angles_unchanged(self):
        gt, est = rot_z(10.0), rot_z(12.5)
        _, _, rx, ry, rz = compute_registration_error(gt, est)
        assert rz == pytest.approx(2.5, abs=1e-3)
        assert rx < 1e-6 and ry < 1e-6


class TestChamfer:
    def test_empty_inputs_return_zero(self):
        assert modified_chamfer_distance(
            np.zeros((0, 3)), np.zeros((5, 3)), np.zeros((5, 3)),
            np.eye(4), np.eye(4),
        ) == 0.0

    def test_identical_clouds_zero(self, rng):
        pts = rng.rand(100, 3).astype(np.float64)
        d = modified_chamfer_distance(pts, pts, pts, np.eye(4), np.eye(4))
        assert d == pytest.approx(0.0, abs=1e-12)


class TestPoseLineFormat:
    def test_fourteen_fields_frames_first(self):
        """Pin the reference's pose-file line (reference infer.py:73):
        ref_frame, src_frame, then the 12 row-major transform floats —
        reference-built tools parse frame ids from the first two fields."""
        from rdmnet_tpu.cli.infer import format_pose_line

        est = np.arange(16, dtype=np.float64).reshape(4, 4) / 7.0
        line = format_pose_line(4, 0, est)
        parts = line.split()
        assert len(parts) == 14
        assert parts[0] == "4" and parts[1] == "0"
        np.testing.assert_allclose(
            np.array(parts[2:], np.float64), est[:3].reshape(-1), atol=1e-6
        )


def test_get_correspondences_and_rmse_helpers():
    from rdmnet_tpu.utils import metrics_np as M

    rng = np.random.RandomState(11)
    ref = rng.rand(60, 3) * 2
    src = ref.copy()
    t = np.eye(4)
    t[:3, 3] = [0.05, 0.0, 0.0]
    # src = T^-1(ref) so aligning with T recovers identity pairs
    src_moved = M.apply_transform(src, np.linalg.inv(t))
    corr = M.get_correspondences(ref, src_moved, transform=t, matching_radius=1e-3)
    assert {(i, i) for i in range(60)} <= set(map(tuple, corr.tolist()))
    assert M.compute_registration_rmse(src, t, t) == 0.0
    assert M.compute_relative_translation_error([1, 2, 2], [1, 2, 2]) == 0.0


def test_evaluate_overlap_separates_labels():
    from rdmnet_tpu.utils import metrics_np as M

    rng = np.random.RandomState(12)
    ref_f = rng.rand(50, 3)
    src_f = rng.rand(50, 3)
    # nodes: first two on the other cloud's points (overlapping), last two far
    ref_node = np.concatenate([src_f[:2], np.full((2, 3), 50.0)])
    src_node = np.concatenate([ref_f[:2], np.full((2, 3), -50.0)])
    ref_scores = np.array([0.9, 0.8, 0.1, 0.2])
    src_scores = np.array([0.7, 0.9, 0.3, 0.1])
    out = M.evaluate_overlap(
        ref_scores, src_scores, ref_f, src_f, ref_node, src_node,
        np.eye(4), n2p_overlap_thres=0.5)
    assert out["n2p_p_mean"] > out["n2p_n_mean"]
    assert set(out) == {"n2p_p_mean", "n2p_n_mean", "n2p_p_std", "n2p_n_std"}


def test_evaluate_overlap_threshold_is_euclidean():
    # regression: a node at distance d with thres^2 < d < thres MUST be
    # labeled positive (an extra sqrt on the already-euclidean NN distance
    # would test d < thres^2 instead)
    from rdmnet_tpu.utils import metrics_np as M

    thres = 0.5  # node at 0.4: 0.25 < 0.4 < 0.5 -> positive
    ref_f = np.zeros((1, 3))
    src_f = np.zeros((1, 3))
    ref_node = np.array([[0.4, 0.0, 0.0], [10.0, 0.0, 0.0]])
    src_node = np.array([[0.4, 0.0, 0.0], [10.0, 0.0, 0.0]])
    scores = np.array([1.0, 0.0])
    out = M.evaluate_overlap(
        scores, scores, ref_f, src_f, ref_node, src_node,
        np.eye(4), n2p_overlap_thres=thres)
    assert out["n2p_p_mean"] == pytest.approx(1.0)
    assert out["n2p_n_mean"] == pytest.approx(0.0)


def test_evaluate_node_overlap_oracle():
    from rdmnet_tpu.utils import metrics_np as M

    gt = np.array([[0, 0], [1, 1], [2, 2]])
    ov = np.array([0.5, 0.7, 0.9])
    pred_r = np.array([0, 1, 3])
    pred_s = np.array([0, 1, 0])
    pred_ov, gt_ov, true_ov, gt_max = M.evaluate_node_overlap(
        4, 3, pred_r, pred_s, gt, ov)
    assert pred_ov == pytest.approx((0.5 + 0.7 + 0.0) / 3)
    assert gt_ov == pytest.approx(ov.mean())
    assert true_ov == pytest.approx(0.6)  # pairs (0,0) and (1,1)
    assert gt_max == pytest.approx(0.7)  # mean over nonzero row/col maxima
