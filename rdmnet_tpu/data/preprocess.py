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


def downsample_sequence(
    root: str, seq_id: str, voxel_size: float = 0.3, out_root: Optional[str] = None
) -> int:
    """Downsample every velodyne .bin of a sequence to downsampled_xyzi npys
    (reference downsample_pcd_kitti.py:11-40)."""
    out_root = out_root or root
    files = sorted(glob.glob(osp.join(root, "sequences", seq_id, "velodyne", "*.bin")))
    out_dir = osp.join(out_root, "downsampled_xyzi", seq_id)
    os.makedirs(out_dir, exist_ok=True)
    for fname in files:
        frame = osp.splitext(osp.basename(fname))[0]
        points = np.fromfile(fname, dtype=np.float32).reshape(-1, 4)
        xyzi = voxel_downsample_xyzi(points, voxel_size)
        np.save(osp.join(out_dir, frame + ".npy"), xyzi)
    return len(files)


def generate_pairs_for_sequence(
    root: str,
    seq: int,
    thres: float = 10.0,
    icp_voxel: float = 0.3,
    out_root: Optional[str] = None,
) -> List[str]:
    """D3Feat-style pair selection + ICP-refined GT for one KITTI sequence
    (reference generate_kitti_pairs.py:95-195). Returns the GT lines written.
    """
    out_root = out_root or root
    poses = read_kitti_poses(osp.join(root, "poses", f"{seq:02d}.txt"))
    velo2cam = read_velo2cam(osp.join(root, "sequences", f"{seq:02d}", "calib.txt"))

    fnames = glob.glob(osp.join(root, "sequences", f"{seq:02d}", "velodyne", "*.bin"))
    inames = sorted(int(osp.splitext(osp.basename(f))[0]) for f in fnames)
    iname_set = set(inames)

    ts = poses[:, :3, 3]
    lines = []
    curr = inames[0]
    while curr in iname_set:
        # next frame more than `thres` meters away within the next 100
        window = np.linalg.norm(ts[curr : curr + 100] - ts[curr], axis=1) > thres
        hits = np.where(window)[0]
        if len(hits) == 0:
            curr += 1
            continue
        nxt = int(hits[0]) + curr - 1
        if nxt not in iname_set:
            curr += 1
            continue

        # GT pose in velodyne frame: M = (velo2cam @ P0^T @ inv(P1^T) @ inv(velo2cam))^T
        m = (
            velo2cam @ poses[curr].T @ np.linalg.inv(poses[nxt].T) @ np.linalg.inv(velo2cam)
        ).T

        xyz0 = np.fromfile(
            osp.join(root, "sequences", f"{seq:02d}", "velodyne", f"{curr:06d}.bin"),
            dtype=np.float32,
        ).reshape(-1, 4)[:, :3]
        xyz1 = np.fromfile(
            osp.join(root, "sequences", f"{seq:02d}", "velodyne", f"{nxt:06d}.bin"),
            dtype=np.float32,
        ).reshape(-1, 4)[:, :3]
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
        curr = nxt + 1

    icp_dir = osp.join(out_root, f"icp{int(thres)}")
    os.makedirs(icp_dir, exist_ok=True)
    with open(osp.join(icp_dir, f"{seq:02d}"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return lines
