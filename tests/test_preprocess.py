"""Preprocessing tests: downsample, ICP, pair generation round trip."""

import os.path as osp

import numpy as np
import pytest

from rdmnet_tpu.graph import native
from rdmnet_tpu.data.preprocess import (
    generate_pairs_for_sequence,
    icp_point_to_point,
    read_kitti_poses,
    read_velo2cam,
    voxel_downsample_xyzi,
)
from rdmnet_tpu.utils.se3_np import apply_transform, euler_zyx_matrix

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


class TestVoxelDownsample:
    def test_centroids_and_intensity(self, rng):
        pts = np.array(
            [[0.1, 0.1, 0.1, 1.0], [0.2, 0.2, 0.2, 3.0], [5.0, 5.0, 5.0, 7.0]],
            np.float32,
        )
        out = voxel_downsample_xyzi(pts, 1.0)
        assert len(out) == 2
        row = out[np.argmin(out[:, 0])]
        np.testing.assert_allclose(row, [0.15, 0.15, 0.15, 2.0], atol=1e-6)

    def test_reduces_density(self, rng):
        pts = (rng.rand(5000, 4) * 10).astype(np.float32)
        out = voxel_downsample_xyzi(pts, 1.0)
        assert 500 < len(out) < 1100


class TestICP:
    def test_recovers_small_misalignment(self, rng):
        pts = (rng.rand(3000, 3) * 20 - 10).astype(np.float32)
        r = euler_zyx_matrix(0.02, -0.01, 0.015)
        tf = np.eye(4)
        tf[:3, :3] = r
        tf[:3, 3] = [0.1, -0.15, 0.05]
        moved = apply_transform(pts, np.linalg.inv(tf)).astype(np.float32)
        est = icp_point_to_point(moved, pts, max_correspondence_distance=0.5)
        realigned = apply_transform(moved, est)
        err = np.linalg.norm(realigned - pts, axis=1)
        assert np.median(err) < 0.02


class TestPairGeneration:
    def _make_kitti(self, tmp_path, rng, num_frames=8, step=4.0, velo2cam=None):
        root = tmp_path / "kitti"
        (root / "poses").mkdir(parents=True)
        seq_dir = root / "sequences" / "00"
        (seq_dir / "velodyne").mkdir(parents=True)
        if velo2cam is None:
            velo2cam = np.eye(4)
        poses = []
        base = (rng.rand(8000, 3) * 40 - 20).astype(np.float32)
        for i in range(num_frames):
            # camera pose i: forward motion along x in the world frame
            world_tf = np.eye(4)
            world_tf[:3, 3] = [step * i, 0, 0]
            poses.append(world_tf[:3].reshape(-1))
            # scan i = world points expressed in the VELODYNE frame:
            # x_velo = inv(velo2cam) inv(P_i) x_world
            local = apply_transform(
                base, np.linalg.inv(velo2cam) @ np.linalg.inv(world_tf)
            ).astype(np.float32)
            xyzi = np.concatenate([local, np.zeros((len(local), 1), np.float32)], 1)
            xyzi.tofile(seq_dir / "velodyne" / f"{i:06d}.bin")
        np.savetxt(root / "poses" / "00.txt", np.array(poses))
        tr = " ".join(str(v) for v in velo2cam[:3].reshape(-1))
        (seq_dir / "calib.txt").write_text(f"Tr: {tr}\n")
        return str(root)

    def test_pairs_written_and_consistent(self, tmp_path, rng):
        root = self._make_kitti(tmp_path, rng)
        lines = generate_pairs_for_sequence(root, 0, thres=10.0)
        assert len(lines) >= 1
        parts = lines[0].split()
        i, j = int(parts[0]), int(parts[1])
        # reference quirk (generate_kitti_pairs.py:130): picks the frame just
        # BEFORE the first >thres one -> 8 m apart at 4 m/frame with thres=10
        assert j - i == 2
        tf = np.array([float(x) for x in parts[2:14]]).reshape(3, 4)
        # frames differ by (j - i) * 4 m translation along x; GT transform
        # maps scan i (src) into scan j's frame
        np.testing.assert_allclose(abs(tf[0, 3]), (j - i) * 4.0, atol=0.2)
        np.testing.assert_allclose(tf[:3, :3], np.eye(3), atol=0.02)

    def test_pairs_with_real_calibration(self, tmp_path, rng):
        """GT must stay correct with a NON-identity velo2cam: the reference
        formula operates on a TRANSPOSED calib matrix, and plugging the
        plain matrix in produced a non-rigid garbage 4x4 (caught only with
        a real calibration — identity is transpose-invariant)."""
        from tests.test_ops_core import random_transform

        velo2cam = np.asarray(random_transform(rng, max_angle=0.8, max_trans=1.0),
                              np.float64)
        root = self._make_kitti(tmp_path, rng, velo2cam=velo2cam)
        lines = generate_pairs_for_sequence(root, 0, thres=10.0)
        assert len(lines) >= 1
        parts = lines[0].split()
        i, j = int(parts[0]), int(parts[1])
        tf = np.eye(4)
        tf[:3] = np.array([float(x) for x in parts[2:14]]).reshape(3, 4)
        # rigidity: R orthonormal with det +1
        r = tf[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-3)
        assert abs(np.linalg.det(r) - 1.0) < 1e-3
        # correctness: maps scan i (velodyne frame i) onto scan j's frame —
        # expected relative motion inv(V) inv(P_j) P_i V
        p = lambda k: np.array(
            [[1, 0, 0, 4.0 * k], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        )
        want = np.linalg.inv(velo2cam) @ np.linalg.inv(p(j)) @ p(i) @ velo2cam
        np.testing.assert_allclose(tf, want, atol=0.15)

    def test_pose_and_calib_readers(self, tmp_path, rng):
        root = self._make_kitti(tmp_path, rng)
        poses = read_kitti_poses(osp.join(root, "poses", "00.txt"))
        assert poses.shape == (8, 4, 4)
        v2c = read_velo2cam(osp.join(root, "sequences", "00", "calib.txt"))
        np.testing.assert_allclose(v2c, np.eye(4))

    # ---- the three non-KITTI adapters (reference generate_{kitti360,
    # apollo,mulran}_pairs.py): synthetic on-disk roots in each exact
    # layout, straight-line 4 m/frame trajectory -> pair (i, i+2) at
    # thres=10, GT must map scan i into scan j's frame.

    @staticmethod
    def _write_scans(scan_dir, paths_and_poses, base, velo2cam):
        """Scans are world points expressed in each frame's velodyne frame:
        x_velo = inv(V) inv(P) x_world."""
        for path, world_tf in paths_and_poses:
            local = apply_transform(
                base, np.linalg.inv(velo2cam) @ np.linalg.inv(world_tf)
            ).astype(np.float32)
            xyzi = np.concatenate([local, np.zeros((len(local), 1), np.float32)], 1)
            xyzi.tofile(path)

    @staticmethod
    def _straight_poses(num_frames, step):
        out = []
        for i in range(num_frames):
            tf = np.eye(4)
            tf[:3, 3] = [step * i, 0, 0]
            out.append(tf)
        return out

    def _check_lines(self, lines, velo2cam, poses_by_frame, row_gap=2, step=4.0):
        assert len(lines) >= 1
        parts = lines[0].split()
        i, j = int(parts[0]), int(parts[1])
        tf = np.eye(4)
        tf[:3] = np.array([float(x) for x in parts[2:14]]).reshape(3, 4)
        r = tf[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-3)
        want = (
            np.linalg.inv(velo2cam) @ np.linalg.inv(poses_by_frame[j])
            @ poses_by_frame[i] @ velo2cam
        )
        np.testing.assert_allclose(tf, want, atol=0.15)
        return i, j

    def test_kitti360_pairs(self, tmp_path, rng):
        from tests.test_ops_core import random_transform

        root = tmp_path / "k360"
        seq = 0
        drive = f"2013_05_28_drive_{seq:04d}_sync"
        scan_dir = root / "data_3d_raw" / drive / "velodyne_points" / "data"
        scan_dir.mkdir(parents=True)
        (root / "data_poses" / drive).mkdir(parents=True)
        (root / "calibration").mkdir(parents=True)
        cam_to_velo = np.asarray(
            random_transform(rng, max_angle=0.8, max_trans=1.0), np.float64
        )
        velo2cam = np.linalg.inv(cam_to_velo)
        np.savetxt(
            root / "calibration" / "calib_cam_to_velo.txt",
            cam_to_velo[:3].reshape(1, -1),
        )
        poses = self._straight_poses(10, 4.0)
        base = (rng.rand(8000, 3) * 40 - 20).astype(np.float32)
        self._write_scans(
            scan_dir,
            [(scan_dir / f"{i:010d}.bin", poses[i]) for i in range(10)],
            base, velo2cam,
        )
        # cam0_to_world is SPARSE in real KITTI-360: omit the first two
        # frames' poses; pair generation must start at the first POSED scan
        rows = [np.concatenate([[i], poses[i].reshape(-1)]) for i in range(2, 10)]
        np.savetxt(root / "data_poses" / drive / "cam0_to_world.txt", np.array(rows))

        lines = generate_pairs_for_sequence(str(root), seq, thres=10.0,
                                            dataset="kitti360")
        i, j = self._check_lines(lines, velo2cam, {k: poses[k] for k in range(10)})
        assert i == 2 and j == 4  # first posed frame, +2 rows at 4 m/frame
        assert osp.exists(root / "icp10" / "0000")

    def test_apollo_pairs(self, tmp_path, rng):
        root = tmp_path / "apollo"
        seq = 1
        base_dir = (root / "kitti_format" / "MapData" / "ColumbiaPark"
                    / "2018-09-21" / f"{seq:02d}")
        (base_dir / "velodyne").mkdir(parents=True)
        poses = self._straight_poses(8, 4.0)
        np.savetxt(base_dir / "poses.txt",
                   np.array([p[:3].reshape(-1) for p in poses]))
        base = (rng.rand(8000, 3) * 40 - 20).astype(np.float32)
        self._write_scans(
            base_dir / "velodyne",
            [(base_dir / "velodyne" / f"{i:06d}.bin", poses[i]) for i in range(8)],
            base, np.eye(4),
        )
        lines = generate_pairs_for_sequence(str(root), seq, thres=10.0,
                                            dataset="apollo")
        i, j = self._check_lines(lines, np.eye(4), {k: poses[k] for k in range(8)})
        assert j - i == 2
        assert osp.exists(root / "icp10" / f"{seq:02d}")

    def test_mulran_pairs(self, tmp_path, rng):
        root = tmp_path / "mulran"
        seq = "kaist01"
        sdir = root / seq / "sensor_data" / "Ouster"
        sdir.mkdir(parents=True)
        # scan names are nanosecond timestamps; pose row i <-> i-th sorted scan
        stamps = [1561000000000 + 100_000_000 * i for i in range(8)]
        poses = self._straight_poses(8, 4.0)
        np.savetxt(root / seq / "sensor_data" / "poses_in_kitti_format.txt",
                   np.array([p[:3].reshape(-1) for p in poses]))
        base = (rng.rand(8000, 3) * 40 - 20).astype(np.float32)
        self._write_scans(
            sdir,
            [(sdir / f"{stamps[i]:d}.bin", poses[i]) for i in range(8)],
            base, np.eye(4),
        )
        lines = generate_pairs_for_sequence(str(root), seq, thres=10.0,
                                            dataset="mulran")
        by_frame = {stamps[i]: poses[i] for i in range(8)}
        i, j = self._check_lines(lines, np.eye(4), by_frame)
        assert stamps.index(j) - stamps.index(i) == 2
        assert osp.exists(root / "icp10" / seq)


class TestEulerConvention:
    def test_matches_scipy_extrinsic_zyx(self, rng):
        """The reference samples rotations with scipy from_euler('zyx')
        (lowercase = EXTRINSIC = Rx@Ry@Rz); our closed form must match."""
        from scipy.spatial.transform import Rotation

        from rdmnet_tpu.utils.se3_np import euler_zyx_matrix

        for _ in range(5):
            az, ay, ax = rng.rand(3) * 2 * np.pi
            want = Rotation.from_euler("zyx", [az, ay, ax]).as_matrix()
            got = euler_zyx_matrix(az, ay, ax)
            np.testing.assert_allclose(got, want, atol=1e-12)
