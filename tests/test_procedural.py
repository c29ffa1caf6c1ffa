"""Procedural LiDAR scene synthesis (rdmnet_tpu/data/procedural.py): scans
must be sensor-frame, occlusion-real (viewpoint-dependent sampling), and the
emitted GT transforms must align overlapping structure; the --procedural CLI
path must produce a loadable KITTI-layout root with DISTINCT scenes per
sequence."""

import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from rdmnet_tpu.data.procedural import (
    SENSOR_HEIGHT,
    lidar_scan,
    make_scene,
    procedural_sequence,
    trajectory,
)

SCRIPT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                  "scripts", "make_synth_kitti.py")

# small ray pattern keeps the suite fast; statistics scale down gracefully
FAST = dict(n_rings=16, n_azimuths=256)


def _nn_dist(a, b, sample=400, seed=0):
    idx = np.random.RandomState(seed).choice(
        len(a), min(sample, len(a)), replace=False)
    return np.linalg.norm(
        a[idx, None, :] - b[None, :, :], axis=-1).min(axis=1)


def test_scan_shape_and_frame():
    rng = np.random.RandomState(3)
    scene = make_scene(rng)
    pose = trajectory(rng, 1)[0]
    scan = lidar_scan(scene, pose, rng, **FAST)
    assert scan.dtype == np.float32 and scan.ndim == 2 and scan.shape[1] == 4
    assert len(scan) > 500
    # sensor frame: ground plane sits ~SENSOR_HEIGHT below the origin
    ground = scan[scan[:, 2] < -1.0, 2]
    assert len(ground) > 50
    assert abs(np.median(ground) + SENSOR_HEIGHT) < 0.3
    # intensity channel is a bounded pseudo-reflectance
    assert np.all((scan[:, 3] > 0) & (scan[:, 3] <= 1))


def test_occlusion_is_viewpoint_dependent():
    """Two poses in the same scene see genuinely different samplings: the
    second scan is NOT a rigid transform of the first (unlike the
    bundled-scan generator) — a fraction of points have no counterpart."""
    scans, poses = procedural_sequence(7, 2, step=10.0, **FAST)
    tf = np.linalg.inv(poses[0]) @ poses[1]
    aligned = scans[1][:, :3] @ tf[:3, :3].T + tf[:3, 3]
    d = _nn_dist(aligned, scans[0][:, :3])
    # overlapping structure aligns to ~the sparse-ray sampling scale...
    assert np.median(d) < 1.0, np.median(d)
    # ...but occlusion shadows leave a real fraction unmatched
    assert (d > 1.0).mean() > 0.02


def test_gt_transform_is_necessary():
    """The emitted GT is a non-trivial motion. Measured on STRUCTURE points
    (above ground — the infinite ground plane matches anywhere, masking the
    motion): raw clouds are far apart; GT-aligned clouds are close."""
    scans, poses = procedural_sequence(11, 2, step=10.0, **FAST)
    tf = np.linalg.inv(poses[0]) @ poses[1]
    aligned = scans[1][:, :3] @ tf[:3, :3].T + tf[:3, 3]
    ref_struct = scans[0][scans[0][:, 2] > -1.0, :3]
    src_struct = scans[1][:, 2] > -1.0
    d_aligned = np.median(_nn_dist(aligned[src_struct], ref_struct))
    d_raw = np.median(_nn_dist(scans[1][src_struct, :3], ref_struct))
    assert d_aligned < 1.0
    assert d_raw > 3.0 * d_aligned


def test_sequences_are_deterministic_and_distinct():
    s1, p1 = procedural_sequence(5, 2, **FAST)
    s1b, p1b = procedural_sequence(5, 2, **FAST)
    s2, _ = procedural_sequence(6, 2, **FAST)
    np.testing.assert_array_equal(s1[0], s1b[0])
    np.testing.assert_array_equal(p1, p1b)
    assert s1[0].shape != s2[0].shape or not np.array_equal(s1[0], s2[0])


def test_procedural_cli_kitti_layout(tmp_path):
    """--procedural N builds loadable train/val/test splits where every
    sequence is a distinct scene and the GT aligns overlapping structure."""
    from rdmnet_tpu.data.datasets import RegistrationPairDataset

    root = tmp_path / "root"
    subprocess.run(
        [sys.executable, SCRIPT, "--out", str(root), "--procedural", "2",
         "--frames", "3", "--val_frames", "2", "--test_frames", "2",
         "--rings", "16", "--azimuths", "256"],
        check=True,
    )
    first_frames = []
    for subset, n_pairs in (("train", 4), ("val", 2), ("test", 3)):
        ds = RegistrationPairDataset("kitti", str(root), subset,
                                     use_augmentation=False)
        assert len(ds) == n_pairs, subset
        item = ds[0]
        first_frames.append(item["ref_points"])
        aligned = (item["src_points"] @ item["transform"][:3, :3].T
                   + item["transform"][:3, 3])
        assert np.median(_nn_dist(aligned, item["ref_points"])) < 1.0, subset
    # distinct scenes across splits (not one geometry re-posed)
    a, b = first_frames[0], first_frames[-1]
    assert a.shape != b.shape or not np.allclose(a, b)


@pytest.mark.parametrize("layout", ["mulran"])
def test_procedural_cli_eval_layout(tmp_path, layout):
    from rdmnet_tpu.data.datasets import RegistrationPairDataset

    root = tmp_path / f"root_{layout}"
    subprocess.run(
        [sys.executable, SCRIPT, "--out", str(root), "--layout", layout,
         "--procedural", "1", "--test_frames", "2",
         "--rings", "16", "--azimuths", "256"],
        check=True,
    )
    ds = RegistrationPairDataset(layout, str(root), "test",
                                 use_augmentation=False)
    assert len(ds) == 1
    item = ds[0]
    aligned = (item["src_points"] @ item["transform"][:3, :3].T
               + item["transform"][:3, 3])
    assert np.median(_nn_dist(aligned, item["ref_points"])) < 1.0
