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
    p_down.add_argument("--root", required=True)
    p_down.add_argument("--seqs", type=int, nargs="+", default=list(range(11)))
    p_down.add_argument("--voxel", type=float, default=0.3)
    p_down.add_argument("--out_root", default=None)

    p_pairs = sub.add_parser("pairs")
    p_pairs.add_argument("--root", required=True)
    p_pairs.add_argument("--seqs", type=int, nargs="+", default=list(range(11)))
    p_pairs.add_argument("--thres", type=float, default=10.0)
    p_pairs.add_argument("--out_root", default=None)

    args = parser.parse_args()
    if args.cmd == "downsample":
        for seq in args.seqs:
            n = downsample_sequence(args.root, f"{seq:02d}", args.voxel, args.out_root)
            print(f"seq {seq:02d}: downsampled {n} scans")
    else:
        for seq in args.seqs:
            lines = generate_pairs_for_sequence(
                args.root, seq, thres=args.thres, out_root=args.out_root
            )
            print(f"seq {seq:02d}: {len(lines)} pairs")


if __name__ == "__main__":
    main()
