"""Synthesize a tiny KITTI-layout dataset from the bundled demo scan.

Builds ``--out`` with the exact KITTI schema the framework (and the
reference, kitti/dataset.py:17-38,106) consumes — ``downsampled_xyzi/%02d/
%06d.npy`` clouds + ``icp10/%02d`` GT pair files — by applying known rigid
motions to the real demo scan, so an end-to-end `rdmnet-trainval` /
`rdmnet-test` smoke run needs no external data. Train pairs live in seq 00,
val pairs in seq 06 (the splits at data/datasets.py SCHEMAS).

Usage: python scripts/make_synth_kitti.py --out /tmp/synth_kitti [--frames 7]
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from rdmnet_tpu.utils.se3_np import euler_zyx_matrix  # noqa: E402


def rigid(rng, max_angle_deg=15.0, max_shift=3.0):
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = euler_zyx_matrix(*(np.deg2rad(max_angle_deg) * rng.randn(3) / 3.0))
    m[:3, 3] = (rng.rand(3) - 0.5) * 2.0 * max_shift
    return m


def build_seq(root, seq, base, n_frames, rng):
    cdir = osp.join(root, "downsampled_xyzi", f"{seq:02d}")
    os.makedirs(cdir, exist_ok=True)
    os.makedirs(osp.join(root, "icp10"), exist_ok=True)
    mats = []
    for i in range(n_frames):
        m = rigid(rng)
        mats.append(m)
        pts = base[:, :3] @ m[:3, :3].T + m[:3, 3]
        pts = pts + rng.randn(*pts.shape) * 0.01
        out = np.concatenate(
            [pts.astype(np.float32), base[:, 3:4].astype(np.float32)], axis=1
        )
        np.save(osp.join(cdir, f"{i:06d}.npy"), out)
    lines = []
    for i in range(n_frames - 1):
        # pair (anc=i+1, pos=i): transform aligning frame i+1 onto frame i
        tf = mats[i] @ np.linalg.inv(mats[i + 1])
        lines.append(
            f"{i + 1} {i} " + " ".join(f"{v:.9f}" for v in tf[:3].reshape(-1))
        )
    with open(osp.join(root, "icp10", f"{seq:02d}"), "w") as f:
        f.write("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=7)
    ap.add_argument("--test_frames", type=int, default=3,
                    help="frames in the test split (seq 08); pairs = frames-1")
    ap.add_argument(
        "--scan", default="/root/reference/assets/pc/000000.npy",
        help="base cloud providing realistic point statistics",
    )
    args = ap.parse_args()

    rng = np.random.RandomState(7351)
    base = np.load(args.scan).astype(np.float32)
    if base.shape[1] == 3:
        base = np.concatenate([base, np.zeros((len(base), 1), np.float32)], 1)

    build_seq(args.out, 0, base, args.frames, rng)   # train split (seqs 0-5)
    build_seq(args.out, 6, base, 3, rng)             # val split (seqs 6-7)
    build_seq(args.out, 8, base, args.test_frames, rng)  # test split (seqs 8-10)
    for seq in (1, 2, 3, 4, 5, 7, 9, 10):
        open(osp.join(args.out, "icp10", f"{seq:02d}"), "a").close()
    print(f"synthetic KITTI root at {args.out}: "
          f"{args.frames - 1} train pairs (seq 00), 2 val pairs (seq 06), "
          f"{args.test_frames - 1} test pairs (seq 08)")


if __name__ == "__main__":
    main()
