"""Preprocessing CLI (reference: preporcess/ scripts).

Usage:
    python -m rdmnet_tpu.cli.preprocess downsample --root /data/KITTI \
        [--seqs 0 1 2 ...] [--voxel 0.3]
    python -m rdmnet_tpu.cli.preprocess pairs --root /data/KITTI \
        [--seqs 0 1 2 ...] [--thres 10]
"""

from __future__ import annotations

import argparse

from rdmnet_tpu.data.preprocess import downsample_sequence, generate_pairs_for_sequence


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_down = sub.add_parser("downsample")
    p_down.add_argument("--dataset", default="kitti",
                        choices=["kitti", "kitti360", "apollo", "mulran"])
    p_down.add_argument("--root", required=True)
    p_down.add_argument("--seqs", nargs="+", default=None)
    p_down.add_argument("--voxel", type=float, default=0.3)
    p_down.add_argument("--out_root", default=None)

    p_pairs = sub.add_parser("pairs")
    p_pairs.add_argument("--dataset", default="kitti",
                         choices=["kitti", "kitti360", "apollo", "mulran"])
    p_pairs.add_argument("--root", required=True)
    p_pairs.add_argument("--seqs", nargs="+", default=None)
    p_pairs.add_argument("--thres", type=float, default=10.0)
    p_pairs.add_argument("--out_root", default=None)

    args = parser.parse_args()
    from rdmnet_tpu.data.datasets import SCHEMAS
    from rdmnet_tpu.data.preprocess import downsample_dataset_sequence

    schema = SCHEMAS[args.dataset]
    default_seqs = list(range(11)) if args.dataset == "kitti" else list(schema.test_seqs)
    seqs = args.seqs or default_seqs
    seqs = [int(s) if str(s).isdigit() else s for s in seqs]

    if args.cmd == "downsample":
        for seq in seqs:
            n = downsample_dataset_sequence(
                args.dataset, args.root, seq, args.voxel, args.out_root
            )
            print(f"seq {seq}: downsampled {n} scans")
    else:
        for seq in seqs:
            lines = generate_pairs_for_sequence(
                args.root, seq, thres=args.thres, out_root=args.out_root,
                dataset=args.dataset,
            )
            print(f"seq {seq}: {len(lines)} pairs")


if __name__ == "__main__":
    main()
