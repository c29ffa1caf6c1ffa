"""Snapshot-sweep evaluation (reference: experiments/test_batchoffline.py:
18-327 — the 'sweep checkpoints' workflow). The reference spawns 4 GPU
processes per epoch; here each epoch's eval runs the jitted pipeline
(recompilation-free across epochs) and the offline eval follows.

Usage:
    python -m rdmnet_tpu.cli.test_sweep --dataset kitti --root /data/KITTI \
        --snapshot_dir DIR --epochs 10 20 30 [--methods lgr ransac]
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="kitti")
    parser.add_argument("--root", required=True)
    parser.add_argument("--snapshot_dir", required=True)
    parser.add_argument("--epochs", type=int, nargs="+", required=True)
    parser.add_argument("--methods", nargs="+", default=["lgr", "ransac"])
    parser.add_argument("--feature_root", default="output/sweep")
    args = parser.parse_args()

    for epoch in args.epochs:
        feature_dir = f"{args.feature_root}/{args.dataset}_epoch{epoch}"
        print(f"=== epoch {epoch}: dump features -> {feature_dir}")
        subprocess.run(
            [
                sys.executable, "-m", "rdmnet_tpu.cli.test",
                "--dataset", args.dataset, "--root", args.root,
                "--snapshot_dir", args.snapshot_dir,
                "--test_epoch", str(epoch),
                "--feature_dir", feature_dir,
            ],
            check=True,
        )
        for method in args.methods:
            print(f"=== epoch {epoch}: eval method={method}")
            subprocess.run(
                [
                    sys.executable, "-m", "rdmnet_tpu.cli.eval",
                    "--feature_dir", feature_dir, "--method", method,
                ],
                check=True,
            )


if __name__ == "__main__":
    main()
