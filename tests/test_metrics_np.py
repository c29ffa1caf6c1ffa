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
