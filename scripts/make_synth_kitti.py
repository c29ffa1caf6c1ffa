"""Synthesize a tiny KITTI-layout dataset from the bundled demo scans.

Builds ``--out`` with the exact KITTI schema the framework (and the
reference, kitti/dataset.py:17-38,106) consumes — ``downsampled_xyzi/%02d/
%06d.npy`` clouds + ``icp10/%02d`` GT pair files — by applying known rigid
motions to real demo scans, so an end-to-end `rdmnet-trainval` /
`rdmnet-test` run needs no external data. With multiple ``--scan`` bases
(default: the three bundled KITTI scans) each base gets its own train
sequence (seqs 00..), plus val (06..) and test (08..) sequences built from
the same geometries under HELD-OUT rigid motions — so test-split metrics
measure motion generalization, not sample memorization. Splits follow
data/datasets.py SCHEMAS: train seqs 0-5, val 6-7, test 8-10.

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
                    help="frames per test sequence; pairs = frames-1")
    ap.add_argument(
        "--scan", nargs="+",
        default=[
            "/root/reference/assets/pc/000000.npy",
            "/root/reference/assets/pc/000004.npy",
            "/root/reference/assets/pc/000007.npy",
        ],
        help="base cloud(s) providing realistic point statistics; each "
             "gets its own train sequence (and val/test sequences with "
             "fresh motions, capped at 2 and 3 sequences by the splits)",
    )
    args = ap.parse_args()

    assert 1 <= len(args.scan) <= 3, "KITTI splits allow at most 3 test seqs"
    rng = np.random.RandomState(7351)
    bases = []
    for path in args.scan:
        base = np.load(path).astype(np.float32)
        if base.shape[1] == 3:
            base = np.concatenate([base, np.zeros((len(base), 1), np.float32)], 1)
        bases.append(base)

    train_seqs, val_seqs, test_seqs = [], [], []
    for i, base in enumerate(bases):                 # train split (seqs 0-5)
        build_seq(args.out, i, base, args.frames, rng)
        train_seqs.append(i)
    for i, base in enumerate(bases[:2]):             # val split (seqs 6-7)
        build_seq(args.out, 6 + i, base, 3, rng)
        val_seqs.append(6 + i)
    for i, base in enumerate(bases):                 # test split (seqs 8-10)
        build_seq(args.out, 8 + i, base, args.test_frames, rng)
        test_seqs.append(8 + i)
    for seq in range(11):
        path = osp.join(args.out, "icp10", f"{seq:02d}")
        if not osp.exists(path):
            open(path, "a").close()
    print(f"synthetic KITTI root at {args.out}: "
          f"{len(train_seqs) * (args.frames - 1)} train pairs (seqs {train_seqs}), "
          f"{len(val_seqs) * 2} val pairs (seqs {val_seqs}), "
          f"{len(test_seqs) * (args.test_frames - 1)} test pairs (seqs {test_seqs})")


if __name__ == "__main__":
    main()
