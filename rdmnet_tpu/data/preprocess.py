"""Offline preprocessing: voxel downsampling + registration-pair generation.

Re-design of reference preporcess/{downsample_pcd_kitti.py:11-40,
generate_kitti_pairs.py:95-195} without open3d:

* ``voxel_downsample_xyzi``: 0.3 m voxel-centroid downsample keeping mean
  intensity (o3d.voxel_down_sample averages points and colors; same here);
* ``icp_point_to_point``: point-to-point ICP over hash-grid nearest
  neighbors (replaces o3d registration_icp, threshold 0.5, max 5000 iters);
* ``generate_pairs``: D3Feat-style pair selection (next frame > `thres`
  meters apart) with GT pose from odometry + velo2cam and ICP refinement,
  using the CORRECTED composition ``M2 = icp_transform @ M``
  (generate_kitti_pairs.py:173; the FCGF-lineage bug is documented in the
  reference's issue.md:1-24).
"""

from __future__ import annotations

import glob
import os
import os.path as osp
from typing import List, Optional, Tuple

import numpy as np

from rdmnet_tpu.graph import native
from rdmnet_tpu.utils.se3_np import apply_transform


def voxel_downsample_xyzi(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """(N, 4) xyzi -> per-voxel centroid xyz + mean intensity."""
    xyz = points[:, :3]
    origin = np.floor(xyz.min(0) / voxel_size) * voxel_size
    coords = np.floor((xyz - origin) / voxel_size).astype(np.int64)
    # unique voxel ids via lexicographic ranking
    order = np.lexsort((coords[:, 0], coords[:, 1], coords[:, 2]))
    sc = coords[order]
    sp = points[order]
    new_seg = np.concatenate([[True], np.any(sc[1:] != sc[:-1], axis=1)])
    seg_ids = np.cumsum(new_seg) - 1
    n_seg = seg_ids[-1] + 1
    sums = np.zeros((n_seg, points.shape[1]), np.float64)
    np.add.at(sums, seg_ids, sp)
    counts = np.bincount(seg_ids, minlength=n_seg)[:, None]
    return (sums / counts).astype(np.float32)


def icp_point_to_point(
    src: np.ndarray,
    ref: np.ndarray,
    init: Optional[np.ndarray] = None,
    max_correspondence_distance: float = 0.5,
    max_iterations: int = 50,
    tolerance: float = 1e-7,
) -> np.ndarray:
    """Point-to-point ICP: returns the transform aligning src -> ref.

    Correspondences are nearest ref neighbors within the distance bound
    (native hash grid); pose update by SVD Procrustes; stops on convergence
    of the incremental update.
    """
    transform = np.eye(4) if init is None else init.copy()
    cur = apply_transform(src, transform)
    for _ in range(max_iterations):
        idx = native.radius_knn_native(
            cur, ref, len(ref), max_correspondence_distance, 1
        )[:, 0]
        valid = idx < len(ref)
        if valid.sum() < 10:
            break
        a = cur[valid]
        b = ref[idx[valid]]
        mu_a, mu_b = a.mean(0), b.mean(0)
        h = (a - mu_a).T @ (b - mu_b)
        u, _, vt = np.linalg.svd(h)
        d = np.sign(np.linalg.det(vt.T @ u.T))
        r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
        t = mu_b - r @ mu_a
        delta = np.eye(4)
        delta[:3, :3] = r
        delta[:3, 3] = t
        transform = delta @ transform
        cur = apply_transform(src, transform)
        if np.abs(delta - np.eye(4)).max() < tolerance:
            break
    return transform


# ---------------------------------------------------------------- KITTI IO

def read_kitti_poses(path: str) -> np.ndarray:
    """Odometry poses file: one 3x4 row-major pose per line -> (N, 4, 4)."""
    data = np.loadtxt(path).reshape(-1, 3, 4)
    n = len(data)
    out = np.tile(np.eye(4), (n, 1, 1))
    out[:, :3, :] = data
    return out


def read_velo2cam(calib_path: str) -> np.ndarray:
    """'Tr:' line of a KITTI calib.txt -> (4, 4) velodyne->camera."""
    with open(calib_path) as f:
        for line in f:
            if line.startswith("Tr"):
                vals = np.array([float(x) for x in line.split()[1:]]).reshape(3, 4)
                out = np.eye(4)
                out[:3, :] = vals
                return out
    raise ValueError(f"no Tr line in {calib_path}")


def read_cam_to_velo(path: str) -> np.ndarray:
    """KITTI-360 calibration/calib_cam_to_velo.txt: 12 floats -> (4, 4)."""
    vals = np.genfromtxt(path).reshape(3, 4)
    out = np.eye(4)
    out[:3, :] = vals
    return out


def read_kitti360_cam0_poses(path: str):
    """KITTI-360 data_poses/.../cam0_to_world.txt: 'frame p00..p33' rows.

    Returns (frame_ids (N,), poses (N, 4, 4))."""
    data = np.loadtxt(path)
    frames = data[:, 0].astype(np.int64)
    poses = data[:, 1:17].reshape(-1, 4, 4)
    return frames, poses


class DatasetAdapter:
    """Paths + pose/calib conventions for pair generation per dataset.

    Mirrors the reference's four near-identical generators
    (preporcess/generate_{kitti,kitti360,apollo,mulran}_pairs.py): each
    provides per-sequence poses (sensor trajectory in a common frame), the
    velodyne<->pose-frame calibration, and scan paths.
    """

    def __init__(self, dataset: str, root: str):
        self.dataset = dataset
        self.root = root

    # lazy lambdas: building every pattern eagerly would crash on the
    # datasets whose seq type differs (mulran uses string sequence names)
    _SCAN_GLOBS = {
        "kitti": lambda seq: f"sequences/{seq:02d}/velodyne/*.bin",
        "kitti360": lambda seq: f"data_3d_raw/2013_05_28_drive_{seq:04d}_sync/velodyne_points/data/*.bin",
        "apollo": lambda seq: f"kitti_format/MapData/ColumbiaPark/2018-09-21/{seq:02d}/velodyne/*.bin",
        "mulran": lambda seq: f"{seq}/sensor_data/Ouster/*.bin",
    }
    _SCAN_PATHS = {
        "kitti": lambda seq, frame: f"sequences/{seq:02d}/velodyne/{frame:06d}.bin",
        "kitti360": lambda seq, frame: f"data_3d_raw/2013_05_28_drive_{seq:04d}_sync/velodyne_points/data/{frame:010d}.bin",
        "apollo": lambda seq, frame: f"kitti_format/MapData/ColumbiaPark/2018-09-21/{seq:02d}/velodyne/{frame:06d}.bin",
        "mulran": lambda seq, frame: f"{seq}/sensor_data/Ouster/{frame:d}.bin",
    }

    def scan_paths(self, seq):
        return sorted(
            glob.glob(osp.join(self.root, self._SCAN_GLOBS[self.dataset](seq)))
        )

    def frame_ids(self, seq):
        return sorted(
            int(osp.splitext(osp.basename(f))[0]) for f in self.scan_paths(seq)
        )

    def scan_path(self, seq, frame):
        return osp.join(self.root, self._SCAN_PATHS[self.dataset](seq, frame))

    def poses_and_calib(self, seq):
        """Returns (frame->pose-row mapping array or None, poses (N,4,4),
        velo2cam (4,4))."""
        if self.dataset == "kitti":
            poses = read_kitti_poses(osp.join(self.root, "poses", f"{seq:02d}.txt"))
            v2c = read_velo2cam(osp.join(self.root, "sequences", f"{seq:02d}", "calib.txt"))
            return None, poses, v2c
        if self.dataset == "kitti360":
            frames, poses = read_kitti360_cam0_poses(
                osp.join(self.root, "data_poses",
                         f"2013_05_28_drive_{seq:04d}_sync", "cam0_to_world.txt")
            )
            cam_to_velo = read_cam_to_velo(
                osp.join(self.root, "calibration", "calib_cam_to_velo.txt")
            )
            # cam0 poses + cam->velo calib; velo2cam = inv(cam_to_velo)
            return frames, poses, np.linalg.inv(cam_to_velo)
        if self.dataset == "apollo":
            poses = read_kitti_poses(
                osp.join(self.root, "kitti_format/MapData/ColumbiaPark/2018-09-21",
                         f"{seq:02d}", "poses.txt")
            )
            return None, poses, np.eye(4)
        if self.dataset == "mulran":
            poses = read_kitti_poses(
                osp.join(self.root, str(seq), "sensor_data",
                         "poses_in_kitti_format.txt")
            )
            # mulran scan names are timestamps: pose row i <-> i-th sorted scan
            return np.asarray(self.frame_ids(seq)), poses, np.eye(4)
        raise ValueError(self.dataset)


def downsample_dataset_sequence(
    dataset: str, root: str, seq, voxel_size: float = 0.3,
    out_root: Optional[str] = None, keep_intensity: bool = True,
) -> int:
    """Dataset-generic downsample (reference downsample_pcd_{kitti,kitti360,
    apollo,mulran}.py; mulran drops intensity)."""
    from rdmnet_tpu.data.datasets import SCHEMAS

    adapter = DatasetAdapter(dataset, root)
    out_root = out_root or root
    files = adapter.scan_paths(seq)
    schema = SCHEMAS[dataset]
    n = 0
    for fname in files:
        frame = int(osp.splitext(osp.basename(fname))[0])
        rel = schema.cloud_path.format(seq=seq, frame=frame)
        out_path = osp.join(out_root, rel)
        os.makedirs(osp.dirname(out_path), exist_ok=True)
        points = np.fromfile(fname, dtype=np.float32).reshape(-1, 4)
        if dataset == "mulran" or not keep_intensity:
            points = np.concatenate(
                [points[:, :3], np.zeros((len(points), 1), np.float32)], 1
            )
        xyzi = voxel_downsample_xyzi(points, voxel_size)
        np.save(out_path, xyzi)
        n += 1
    return n


def generate_pairs_for_sequence(
    root: str,
    seq,
    thres: float = 10.0,
    icp_voxel: float = 0.3,
    out_root: Optional[str] = None,
    dataset: str = "kitti",
) -> List[str]:
    """D3Feat-style pair selection + ICP-refined GT for one sequence of any
    supported dataset (reference generate_{kitti,kitti360,apollo,mulran}_
    pairs.py). Returns the GT lines written.
    """
    out_root = out_root or root
    adapter = DatasetAdapter(dataset, root)
    frame_map, poses, velo2cam = adapter.poses_and_calib(seq)

    inames = adapter.frame_ids(seq)
    iname_set = set(inames)
    if frame_map is not None:
        # pose row i corresponds to frame frame_map[i]
        row_of_frame = {int(f): i for i, f in enumerate(frame_map)}
    else:
        row_of_frame = None

    def pose_of(frame):
        row = row_of_frame[frame] if row_of_frame is not None else frame
        return poses[row]

    def frame_at_offset(frame, offset):
        """frame index advanced by `offset` pose rows (kitti/apollo: same
        as +offset; mulran/kitti360: step through the frame list)."""
        if row_of_frame is None:
            return frame + offset
        row = row_of_frame.get(frame)
        if row is None or row + offset >= len(frame_map) or row + offset < 0:
            return None
        return int(frame_map[row + offset])

    ts = poses[:, :3, 3]
    lines = []
    # pose files can be sparse (KITTI-360 cam0_to_world has gaps and may
    # start after the first raw scan): begin at the first scan WITH a pose
    if row_of_frame is not None:
        posed = [f for f in inames if f in row_of_frame]
        curr = posed[0] if posed else -1
    else:
        curr = inames[0]
    while curr in iname_set:
        row = row_of_frame[curr] if row_of_frame is not None else curr
        # next frame more than `thres` meters away within the next 100 rows
        window = np.linalg.norm(ts[row : row + 100] - ts[row], axis=1) > thres
        hits = np.where(window)[0]
        if len(hits) == 0:
            curr = frame_at_offset(curr, 1)
            if curr is None:
                break
            continue
        nxt = frame_at_offset(curr, int(hits[0]) - 1)
        if nxt is None or nxt not in iname_set:
            curr = frame_at_offset(curr, 1)
            if curr is None:
                break
            continue

        # GT pose mapping scan0 (curr) velodyne coords into scan1 (nxt)
        # velodyne coords: x_v1 = inv(V) inv(P1) P0 V x_v0 with V = velo2cam
        # and P = pose-frame->world poses. This is the reference's
        # M = (velo2cam @ P0^T @ inv(P1^T) @ inv(velo2cam))^T with its
        # TRANSPOSED velo2cam convention unfolded into plain matrices
        # (reference generate_kitti_pairs.py:56-70 builds velo2cam as
        # vstack(Tr).T; using the untransposed matrix in that formula
        # produces a non-rigid 4x4 for any non-identity calibration).
        m = (
            np.linalg.inv(velo2cam) @ np.linalg.inv(pose_of(nxt))
            @ pose_of(curr) @ velo2cam
        )

        xyz0 = np.fromfile(adapter.scan_path(seq, curr), dtype=np.float32).reshape(-1, 4)[:, :3]
        xyz1 = np.fromfile(adapter.scan_path(seq, nxt), dtype=np.float32).reshape(-1, 4)[:, :3]
        # ICP on voxel-downsampled clouds (speeds up the refinement; o3d's
        # dense-cloud ICP at 0.5 m threshold converges to the same optimum)
        xyz0 = voxel_downsample_xyzi(
            np.concatenate([xyz0, np.zeros((len(xyz0), 1), np.float32)], 1), icp_voxel
        )[:, :3]
        xyz1 = voxel_downsample_xyzi(
            np.concatenate([xyz1, np.zeros((len(xyz1), 1), np.float32)], 1), icp_voxel
        )[:, :3]

        xyz0_t = apply_transform(xyz0, m)
        icp_tf = icp_point_to_point(xyz0_t, xyz1, max_correspondence_distance=0.5)
        # corrected composition (reference generate_kitti_pairs.py:173)
        m2 = icp_tf @ m

        vals = m2.reshape(-1)[:12]
        lines.append(
            f"{curr} {nxt} " + " ".join(f"{v:.6f}" for v in vals) + " "
        )
        curr = frame_at_offset(nxt, 1)
        if curr is None:
            break

    icp_dir = osp.join(out_root, f"icp{int(thres)}")
    os.makedirs(icp_dir, exist_ok=True)
    from rdmnet_tpu.data.datasets import SCHEMAS

    gt_name = SCHEMAS[dataset].gt_file.format(seq=seq).split("/")[-1]
    with open(osp.join(icp_dir, gt_name), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return lines
