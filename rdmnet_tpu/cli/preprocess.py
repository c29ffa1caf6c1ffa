"""Preprocessing CLI (reference: preporcess/ scripts).

Usage:
    python -m rdmnet_tpu.cli.preprocess downsample --root /data/KITTI \
        [--seqs 0 1 2 ...] [--voxel 0.3]
    python -m rdmnet_tpu.cli.preprocess pairs --root /data/KITTI \
        [--seqs 0 1 2 ...] [--thres 10]
"""

from __future__ import annotations

import argparse

from rdmnet_tpu.data.preprocess import generate_pairs_for_sequence


def main():
    from rdmnet_tpu.cli.common import enable_compile_cache
    enable_compile_cache()  # minutes-long TPU compiles -> one-time cost
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

    # per-dataset static-capacity calibration: neighbor limits (the
    # reference calibrates these per run, utils/data.py:195-220) plus this
    # framework's banded-search caps — both become PyramidConfig constants
    p_cal = sub.add_parser("calibrate")
    p_cal.add_argument("--dataset", default="kitti",
                       choices=["kitti", "kitti360", "apollo", "mulran"])
    p_cal.add_argument("--root", required=True)
    p_cal.add_argument("--subset", default="train")
    p_cal.add_argument("--num_scans", type=int, default=20)
    p_cal.add_argument("--keep_ratio", type=float, default=0.8)

    args = parser.parse_args()

    if args.cmd == "calibrate":
        # offline host-side utility: eager per-level dispatch over a remote
        # accelerator pays tunnel latency + one compile per pyramid shape
        # (measured: 15+ min vs seconds on the host CPU) — force CPU before
        # any device use (the env var alone is ignored when a TPU plugin is
        # present, tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
        import numpy as np

        from rdmnet_tpu.config import make_cfg
        from rdmnet_tpu.data.calibration import (
            calibrate_band_caps,
            calibrate_neighbor_limits,
        )
        from rdmnet_tpu.data.datasets import RegistrationPairDataset

        cfg = make_cfg()
        extra = {"demo_asset_dir": args.root} if args.subset == "infer" else {}
        dataset = RegistrationPairDataset(
            args.dataset, root=args.root, subset=args.subset,
            point_limit=cfg.train.point_limit, **extra,
        )
        step = max(1, len(dataset) // args.num_scans)
        clouds = []
        for i in range(0, len(dataset), step):
            item = dataset[i]
            clouds.append(np.asarray(item["ref_points"], np.float32))
            if len(clouds) >= args.num_scans:
                break
        limits = calibrate_neighbor_limits(clouds, cfg.pyramid,
                                           keep_ratio=args.keep_ratio)
        bands = calibrate_band_caps(clouds, cfg.pyramid)
        print(f"neighbor_limits = {limits}")
        print(f"band_caps = {bands}")
        limits_flag = ",".join(str(v) for v in limits)
        bands_flag = ",".join("none" if b is None else str(b) for b in bands)
        print("pass to rdmnet-trainval / rdmnet-test / rdmnet-infer / "
              "rdmnet-export:")
        print(f"  --neighbor_limits {limits_flag} --band_caps {bands_flag}")
        return
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
