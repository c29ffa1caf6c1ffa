"""Registration pair datasets: KITTI / KITTI-360 / Apollo-SouthBay / MulRan.

Host-side metadata + numpy loading, re-designed from the reference's four
near-identical torch Datasets (reference: rdmnet/datasets/registration/
{kitti,kitti_360,apollo,mulran}/dataset.py) into one parameterized class.
Schemas (paths, splits, GT-file formats) preserved exactly:

| dataset  | GT file           | cloud path                                 | splits |
|----------|-------------------|--------------------------------------------|--------|
| kitti    | icp10/%02d        | downsampled_xyzi/%02d/%06d.npy             | train 0-5 / val 6-7 / test 8-10 (kitti/dataset.py:41-51) |
| kitti360 | icp10/%04d        | downsampled_xyzi/%04d/%010d.npy            | test [0,2,3,4,5,6,7,9,10] (kitti_360/dataset.py:48-54)  |
| apollo   | icp10/%02d        | downsampled_xyzi/%02d/%06d.npy             | test [1,2,3,4] (apollo/dataset.py:42-48)                |
| mulran   | icp10/<seq>       | downsampled_xyzi/<seq>/%d.npy              | test [kaist01, riveside01, sejong01] (mulran/dataset.py:41-48) |

GT line format: ``anc_idx pos_idx r00 r01 ... t2`` (3x4 row-major), frame0 =
pos_idx (ref), frame1 = anc_idx (src) (kitti/dataset.py:17-38).
"""

from __future__ import annotations

import dataclasses
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from rdmnet_tpu.utils.se3_np import augment_point_cloud_pair


@dataclasses.dataclass(frozen=True)
class DatasetSchema:
    gt_file: str              # format string over seq
    cloud_path: str           # format string over (seq, frame)
    train_seqs: tuple = ()
    val_seqs: tuple = ()
    test_seqs: tuple = ()


SCHEMAS: Dict[str, DatasetSchema] = {
    "kitti": DatasetSchema(
        gt_file="icp10/{seq:02d}",
        cloud_path="downsampled_xyzi/{seq:02d}/{frame:06d}.npy",
        train_seqs=(0, 1, 2, 3, 4, 5),
        val_seqs=(6, 7),
        test_seqs=(8, 9, 10),
    ),
    "kitti360": DatasetSchema(
        gt_file="icp10/{seq:04d}",
        cloud_path="downsampled_xyzi/{seq:04d}/{frame:010d}.npy",
        test_seqs=(0, 2, 3, 4, 5, 6, 7, 9, 10),
    ),
    "apollo": DatasetSchema(
        gt_file="icp10/{seq:02d}",
        cloud_path="downsampled_xyzi/{seq:02d}/{frame:06d}.npy",
        test_seqs=(1, 2, 3, 4),
    ),
    "mulran": DatasetSchema(
        gt_file="icp10/{seq}",
        cloud_path="downsampled_xyzi/{seq}/{frame:d}.npy",
        test_seqs=("kaist01", "riveside01", "sejong01"),
    ),
}


def load_gt_pairs(path: str, seq) -> List[dict]:
    """Parse one GT pair file (reference kitti/dataset.py:17-38)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 14:
                continue
            anc_idx, pos_idx = int(parts[0]), int(parts[1])
            tf = np.array([float(x) for x in parts[2:14]]).reshape(3, 4)
            tf = np.vstack([tf, [0.0, 0.0, 0.0, 1.0]])
            out.append(
                {"seq_id": seq, "frame0": pos_idx, "frame1": anc_idx,
                 "transform": tf.astype(np.float32)}
            )
    return out


def make_dataset(dataset: str, root: str, subset: str) -> List[dict]:
    schema = SCHEMAS[dataset]
    if subset == "infer":
        # the two bundled demo pairs (reference kitti/dataset.py:56-63)
        return [
            {"seq_id": 0, "frame0": 0, "frame1": 4, "transform": np.eye(4, dtype=np.float32)},
            {"seq_id": 0, "frame0": 0, "frame1": 7, "transform": np.eye(4, dtype=np.float32)},
        ]
    seqs = {
        "train": schema.train_seqs,
        "val": schema.val_seqs,
        "test": schema.test_seqs,
    }[subset]
    metadata = []
    for seq in seqs:
        metadata += load_gt_pairs(osp.join(root, schema.gt_file.format(seq=seq)), seq)
    return metadata


class RegistrationPairDataset:
    """One (ref, src) pair per item; returns numpy dicts.

    Matches the reference per-item behavior (kitti/dataset.py:108-191):
    random point_limit subsample, optional augmentation.

    Beyond the reference: ``root`` may be a comma-separated list of roots
    (same on-disk schema), concatenated into one dataset — e.g. joint
    training over full-360 and FOV-cropped procedural regimes. With more
    than one root, ``seq_id`` is disambiguated as ``"<i>.<seq>"`` (root
    index prefix) so feature-dump names and trajectory grouping stay
    collision-free; cloud paths are resolved eagerly per root.
    """

    def __init__(
        self,
        dataset: str,
        root: str,
        subset: str,
        point_limit: Optional[int] = None,
        use_augmentation: bool = False,
        augmentation_noise: float = 0.01,
        augmentation_min_scale: float = 0.8,
        augmentation_max_scale: float = 1.2,
        augmentation_shift: float = 2.0,
        augmentation_rotation: float = 1.0,
        seed: int = 7351,
        demo_asset_dir: Optional[str] = None,
    ):
        self.dataset = dataset
        self.schema = SCHEMAS[dataset]
        self.subset = subset
        self.point_limit = point_limit
        self.use_augmentation = use_augmentation
        self.aug = dict(
            noise=augmentation_noise,
            min_scale=augmentation_min_scale,
            max_scale=augmentation_max_scale,
            shift=augmentation_shift,
            rotation_factor=augmentation_rotation,
        )
        self.rng = np.random.RandomState(seed)
        self.demo_asset_dir = demo_asset_dir
        roots = [r for r in str(root).split(",") if r]
        self.root = roots[0]
        if subset == "infer" or len(roots) == 1:
            self.metadata = make_dataset(dataset, self.root, subset)
        else:
            self.metadata = []
            for i, r in enumerate(roots):
                for meta in make_dataset(dataset, r, subset):
                    seq, f0, f1 = meta["seq_id"], meta["frame0"], meta["frame1"]
                    meta["ref_path"] = osp.join(
                        r, self.schema.cloud_path.format(seq=seq, frame=f0))
                    meta["src_path"] = osp.join(
                        r, self.schema.cloud_path.format(seq=seq, frame=f1))
                    meta["seq_id"] = f"{i}.{seq}"
                    self.metadata.append(meta)

    def __len__(self):
        return len(self.metadata)

    def _cloud_path(self, seq, frame) -> str:
        if self.subset == "infer":
            base = self.demo_asset_dir or osp.join(self.root, "assets/pc")
            return osp.join(base, f"{frame:06d}.npy")
        return osp.join(self.root, self.schema.cloud_path.format(seq=seq, frame=frame))

    def _load_point_cloud(self, path: str) -> np.ndarray:
        points = np.load(path)[:, :3].astype(np.float32)
        if self.point_limit is not None and points.shape[0] > self.point_limit:
            indices = self.rng.permutation(points.shape[0])[: self.point_limit]
            points = points[indices]
        return points

    def __getitem__(self, index: int) -> dict:
        meta = self.metadata[index]
        ref_points = self._load_point_cloud(
            meta.get("ref_path") or self._cloud_path(meta["seq_id"], meta["frame0"]))
        src_points = self._load_point_cloud(
            meta.get("src_path") or self._cloud_path(meta["seq_id"], meta["frame1"]))
        transform = meta["transform"].astype(np.float32)

        if self.use_augmentation:
            ref_points, src_points, transform = augment_point_cloud_pair(
                self.rng, ref_points, src_points, transform, **self.aug
            )

        return {
            "seq_id": meta["seq_id"],
            "ref_frame": meta["frame0"],
            "src_frame": meta["frame1"],
            "ref_points": ref_points,
            "src_points": src_points,
            "transform": transform,
        }
