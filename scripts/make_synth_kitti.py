"""Synthesize a tiny dataset in any of the four supported layouts from the
bundled demo scans.

Builds ``--out`` with the exact on-disk schema the framework (and the
reference, rdmnet/datasets/registration/*/dataset.py) consumes — GT pair
files + per-sequence cloud directories, formatted per ``--layout`` from the
single-source ``rdmnet_tpu.data.datasets.SCHEMAS`` table — by applying known
rigid motions to real demo scans, so an end-to-end `rdmnet-trainval` /
`rdmnet-test` run needs no external data.

``--layout kitti`` (default) builds train/val/test splits: with multiple
``--scan`` bases (default: the three bundled KITTI scans) each base gets its
own train sequence (seqs 00..), plus val (06..) and test (08..) sequences
built from the same geometries under HELD-OUT rigid motions — so test-split
metrics measure motion generalization, not sample memorization.

``--layout kitti360|apollo|mulran`` builds the test split only (those
datasets are evaluation-only in the reference, README.md:99-108): one test
sequence per base scan in that schema's exact path/GT format (e.g. MulRan's
string sequence names and un-padded frame numbers), letting the
cross-dataset evaluation workflow — including the MulRan vote-off quirk
(reference test.py:107-108) — run on chip with zero external data.

Usage: python scripts/make_synth_kitti.py --out /tmp/synth_kitti [--frames 7]
       python scripts/make_synth_kitti.py --out /tmp/synth_mulran --layout mulran
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from rdmnet_tpu.data.datasets import SCHEMAS  # noqa: E402
from rdmnet_tpu.utils.se3_np import euler_zyx_matrix  # noqa: E402


def rigid(rng, max_angle_deg=15.0, max_shift=3.0):
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = euler_zyx_matrix(*(np.deg2rad(max_angle_deg) * rng.randn(3) / 3.0))
    m[:3, 3] = (rng.rand(3) - 0.5) * 2.0 * max_shift
    return m


def build_seq(root, schema, seq, base, n_frames, rng, intensity=True):
    gt_path = osp.join(root, schema.gt_file.format(seq=seq))
    os.makedirs(osp.dirname(gt_path), exist_ok=True)
    mats = []
    for i in range(n_frames):
        m = rigid(rng)
        mats.append(m)
        pts = base[:, :3] @ m[:3, :3].T + m[:3, 3]
        pts = pts + rng.randn(*pts.shape) * 0.01
        out = pts.astype(np.float32)
        if intensity:
            out = np.concatenate([out, base[:, 3:4].astype(np.float32)], axis=1)
        cloud_path = osp.join(root, schema.cloud_path.format(seq=seq, frame=i))
        os.makedirs(osp.dirname(cloud_path), exist_ok=True)
        np.save(cloud_path, out)
    lines = []
    for i in range(n_frames - 1):
        # pair (anc=i+1, pos=i): transform aligning frame i+1 onto frame i
        tf = mats[i] @ np.linalg.inv(mats[i + 1])
        lines.append(
            f"{i + 1} {i} " + " ".join(f"{v:.9f}" for v in tf[:3].reshape(-1))
        )
    with open(gt_path, "w") as f:
        f.write("\n".join(lines))


def build_procedural_seq(root, schema, seq, seed, n_frames, rings, azimuths,
                         step, intensity=True, fov_deg=None, enrich=False,
                         dropout=0.0):
    """One procedurally generated scene per sequence: ray-cast scans from a
    moving sensor (viewpoint-dependent occlusion), GT pair transforms from
    the exact sensor poses. Distinct seeds per sequence mean test splits
    hold out whole SCENES, not just motions."""
    from rdmnet_tpu.data.procedural import procedural_sequence

    scans, poses = procedural_sequence(
        seed, n_frames, n_rings=rings, n_azimuths=azimuths, step=step,
        fov_deg=fov_deg, enrich=enrich, dropout=dropout,
    )
    gt_path = osp.join(root, schema.gt_file.format(seq=seq))
    os.makedirs(osp.dirname(gt_path), exist_ok=True)
    for i, scan in enumerate(scans):
        out = scan if intensity else scan[:, :3]
        cloud_path = osp.join(root, schema.cloud_path.format(seq=seq, frame=i))
        os.makedirs(osp.dirname(cloud_path), exist_ok=True)
        np.save(cloud_path, out)
    lines = []
    for i in range(n_frames - 1):
        # pair (anc=i+1, pos=i): sensor-frame points obey
        # p_i = inv(T_i) @ T_{i+1} @ p_{i+1}
        tf = np.linalg.inv(poses[i]) @ poses[i + 1]
        lines.append(
            f"{i + 1} {i} " + " ".join(f"{v:.9f}" for v in tf[:3].reshape(-1))
        )
    with open(gt_path, "w") as f:
        f.write("\n".join(lines))


def touch_empty_gt(root, schema, seqs):
    """Empty GT files for split sequences we did not populate, so
    make_dataset can iterate the schema's full split lists."""
    for seq in seqs:
        path = osp.join(root, schema.gt_file.format(seq=seq))
        os.makedirs(osp.dirname(path), exist_ok=True)
        if not osp.exists(path):
            open(path, "a").close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--layout", default="kitti", choices=sorted(SCHEMAS),
                    help="on-disk schema to synthesize; non-kitti layouts "
                         "are test-split-only (evaluation datasets)")
    ap.add_argument("--frames", type=int, default=7)
    ap.add_argument("--test_frames", type=int, default=3,
                    help="frames per test sequence; pairs = frames-1")
    ap.add_argument("--val_frames", type=int, default=3,
                    help="frames per val sequence; pairs = frames-1")
    ap.add_argument(
        "--procedural", type=int, default=0, metavar="N",
        help="instead of transforming the bundled scans, ray-cast N "
             "procedurally generated scenes (rdmnet_tpu.data.procedural): "
             "kitti layout assigns train/val/test sequences DISTINCT "
             "scenes (held-out-scene testing), capped by the schema's "
             "split lists; other layouts build N test sequences",
    )
    ap.add_argument("--rings", type=int, default=44,
                    help="LiDAR elevation rings for --procedural scans")
    ap.add_argument("--azimuths", type=int, default=1100,
                    help="LiDAR azimuth steps for --procedural scans")
    ap.add_argument("--step", type=float, default=10.0,
                    help="sensor advance per frame (m) for --procedural "
                         "(the reference pairs frames >10 m apart)")
    ap.add_argument(
        "--fov_deg", type=float, default=None,
        help="azimuthal field of view for --procedural scans, a BODY-FIXED "
             "sector centered forward: MulRan-style sensors lose ~70 deg to "
             "the vehicle (reference README.md:108) — pass 290 to replicate "
             "that asymmetric-overlap stress regime",
    )
    ap.add_argument(
        "--enrich", action="store_true",
        help="enable the enriched --procedural generator (curved corridor, "
             "non-planar terrain, in-corridor clutter — "
             "rdmnet_tpu.data.procedural.make_scene enrich=True); default "
             "off so existing seed-addressed roots reproduce bit-for-bit",
    )
    ap.add_argument(
        "--dropout", type=float, default=0.0,
        help="range-weighted per-return dropout probability scale for "
             "--procedural scans (Velodyne-like return loss; ~0.3 drops "
             "roughly a fifth of returns)",
    )
    ap.add_argument(
        "--seed", type=int, default=7351,
        help="base RNG seed; per-sequence scene seeds are drawn from it in "
             "split order, so two roots built with the SAME seed share "
             "scene geometry sequence-for-sequence (e.g. the mulran-layout "
             "test scenes reuse the kitti-layout train-scene draws) — pass "
             "a different seed to guarantee disjoint scenes across roots",
    )
    ap.add_argument(
        "--scan", nargs="+",
        default=[
            "/root/reference/assets/pc/000000.npy",
            "/root/reference/assets/pc/000004.npy",
            "/root/reference/assets/pc/000007.npy",
        ],
        help="base cloud(s) providing realistic point statistics; each "
             "gets its own sequence per split (capped by the schema's "
             "split lists)",
    )
    args = ap.parse_args()

    schema = SCHEMAS[args.layout]
    rng = np.random.RandomState(args.seed)

    if args.procedural:
        intensity = args.layout != "mulran"

        def build(seq, n_frames):
            build_procedural_seq(
                args.out, schema, seq, int(rng.randint(2**31)), n_frames,
                args.rings, args.azimuths, args.step, intensity=intensity,
                fov_deg=args.fov_deg, enrich=args.enrich,
                dropout=args.dropout,
            )

        if args.layout == "kitti":
            # N train scenes (capped by the schema's 6 train seqs); val and
            # test get the schema's full split lists — every sequence is a
            # DISTINCT scene, so test metrics measure scene generalization
            train_seqs = list(schema.train_seqs[: min(args.procedural,
                                                      len(schema.train_seqs))])
            val_seqs, test_seqs = list(schema.val_seqs), list(schema.test_seqs)
            for seq in train_seqs:
                build(seq, args.frames)
            for seq in val_seqs:
                build(seq, args.val_frames)
            for seq in test_seqs:
                build(seq, args.test_frames)
            touch_empty_gt(
                args.out, schema,
                [s for s in schema.train_seqs if s not in train_seqs],
            )
            print(f"procedural kitti root at {args.out}: "
                  f"{len(train_seqs) * (args.frames - 1)} train pairs "
                  f"(seqs {train_seqs}), "
                  f"{len(val_seqs) * (args.val_frames - 1)} val pairs, "
                  f"{len(test_seqs) * (args.test_frames - 1)} test pairs "
                  f"— all sequences distinct scenes")
        else:
            test_seqs = list(schema.test_seqs[: min(args.procedural,
                                                    len(schema.test_seqs))])
            for seq in test_seqs:
                build(seq, args.test_frames)
            touch_empty_gt(
                args.out, schema,
                [s for s in schema.test_seqs if s not in test_seqs],
            )
            print(f"procedural {args.layout} root at {args.out}: "
                  f"{len(test_seqs) * (args.test_frames - 1)} test pairs "
                  f"(seqs {test_seqs})")
        return

    bases = []
    for path in args.scan:
        base = np.load(path).astype(np.float32)
        if base.shape[1] == 3:
            base = np.concatenate([base, np.zeros((len(base), 1), np.float32)], 1)
        bases.append(base)
    # MulRan clouds ship without intensity (reference downsample_pcd_mulran)
    intensity = args.layout != "mulran"

    if args.layout == "kitti":
        assert 1 <= len(bases) <= 3, "KITTI splits allow at most 3 test seqs"
        train_seqs, val_seqs, test_seqs = [], [], []
        for i, base in enumerate(bases):                 # train split (seqs 0-5)
            build_seq(args.out, schema, i, base, args.frames, rng)
            train_seqs.append(i)
        for i, base in enumerate(bases[:2]):             # val split (seqs 6-7)
            build_seq(args.out, schema, 6 + i, base, args.val_frames, rng)
            val_seqs.append(6 + i)
        for i, base in enumerate(bases):                 # test split (seqs 8-10)
            build_seq(args.out, schema, 8 + i, base, args.test_frames, rng)
            test_seqs.append(8 + i)
        touch_empty_gt(
            args.out, schema,
            [s for s in schema.train_seqs + schema.val_seqs + schema.test_seqs
             if s not in train_seqs + val_seqs + test_seqs],
        )
        print(f"synthetic kitti root at {args.out}: "
              f"{len(train_seqs) * (args.frames - 1)} train pairs (seqs {train_seqs}), "
              f"{len(val_seqs) * (args.val_frames - 1)} val pairs (seqs {val_seqs}), "
              f"{len(test_seqs) * (args.test_frames - 1)} test pairs (seqs {test_seqs})")
    else:
        assert len(bases) <= len(schema.test_seqs), (
            f"{args.layout} has only {len(schema.test_seqs)} test sequences")
        test_seqs = list(schema.test_seqs[: len(bases)])
        for seq, base in zip(test_seqs, bases):
            build_seq(args.out, schema, seq, base, args.test_frames, rng,
                      intensity=intensity)
        touch_empty_gt(
            args.out, schema,
            [s for s in schema.test_seqs if s not in test_seqs],
        )
        print(f"synthetic {args.layout} root at {args.out}: "
              f"{len(test_seqs) * (args.test_frames - 1)} test pairs "
              f"(seqs {test_seqs})")


if __name__ == "__main__":
    main()
