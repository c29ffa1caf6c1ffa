"""Quick-demo inference over the bundled scan pairs (reference:
experiments/infer.py:19-129): predicts correspondences + relative pose,
writes KITTI-format pose lines and per-pair npz.

Usage:
    python -m rdmnet_tpu.cli.infer [--snapshot_dir DIR] [--asset_dir DIR]
                                   [--output_dir DIR]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import jax
import numpy as np

from rdmnet_tpu.cli.common import (
    build_model_and_params,
    make_cli_cfg,
    make_forward,
    pad_pair_np,
    trim_outputs,
)
from rdmnet_tpu.data.datasets import RegistrationPairDataset


def format_pose_line(ref_frame: int, src_frame: int, est: np.ndarray) -> str:
    """'ref_frame src_frame' + 12 transform floats, the reference's
    14-field pose-file line (reference infer.py:73)."""
    return f"{ref_frame} {src_frame} " + " ".join(
        f"{v:.6f}" for v in np.asarray(est)[:3].reshape(-1)
    )


def main():
    from rdmnet_tpu.cli.common import enable_compile_cache
    enable_compile_cache()  # minutes-long TPU compiles -> one-time cost
    parser = argparse.ArgumentParser()
    from rdmnet_tpu.cli.common import add_pyramid_overrides
    add_pyramid_overrides(parser)
    parser.add_argument("--snapshot_dir", default=None)
    parser.add_argument("--test_epoch", type=int, default=None)
    parser.add_argument("--asset_dir", default="/root/reference/assets/pc")
    parser.add_argument("--output_dir", default="output/infer")
    parser.add_argument("--ransac_iterations", type=int, default=50000)
    parser.add_argument("--torch_checkpoint", default=None)
    parser.add_argument("--no_parity_cfg", action="store_true")
    parser.add_argument(
        "--parity_cfg", action="store_true",
        help="use the reference-faithful parity config without a torch "
             "checkpoint (required when consuming a snapshot written by "
             "cli/convert)",
    )
    parser.add_argument(
        "--coarse_module", default=None,
        choices=["thdroformer", "geotransformer", "ape"],
        help="coarse transformer family (ablation; default thdroformer)",
    )
    args = parser.parse_args()

    cfg = make_cli_cfg(args)
    os.makedirs(args.output_dir, exist_ok=True)

    dataset = RegistrationPairDataset(
        "kitti", root=args.asset_dir, subset="infer", demo_asset_dir=args.asset_dir
    )
    model, params = build_model_and_params(
        cfg, args.snapshot_dir, args.test_epoch,
        torch_checkpoint=args.torch_checkpoint,
    )
    forward = make_forward(cfg, model, with_gt=False)

    pose_lines = []
    for i in range(len(dataset)):
        item = dataset[i]
        rp, rc, sp, sc = pad_pair_np(cfg, item["ref_points"], item["src_points"])
        out = forward(params, rp, rc, sp, sc, np.eye(4, dtype=np.float32))
        dumped = trim_outputs(out, np.eye(4, dtype=np.float32))
        est = dumped["estimated_transform"]

        # RANSAC re-solve of the predicted correspondences, stored alongside
        # the LGR pose (reference infer.py:75-82 does this with o3d RANSAC).
        # Runs the parallel-hypothesis device solver (ops/ransac.py) on the
        # already-live jax backend — pass --ransac_iterations 0 to skip
        # when only the LGR pose is needed.
        if args.ransac_iterations > 0:
            from rdmnet_tpu.cli.eval import ransac_device

            cfg_r = cfg.ransac
            dumped["ransac_transform"] = ransac_device(
                dumped["src_corr_points"], dumped["ref_corr_points"],
                dumped["corr_scores"], num_iterations=args.ransac_iterations,
                num_samples=cfg_r.num_points, threshold=cfg_r.distance_threshold,
            )

        name = f"{item['seq_id']}_{item['src_frame']}_{item['ref_frame']}"
        np.savez_compressed(osp.join(args.output_dir, name + ".npz"), **dumped)
        pose_lines.append(
            format_pose_line(item["ref_frame"], item["src_frame"], est)
        )
        print(
            f"pair {item['src_frame']}->{item['ref_frame']}: "
            f"{len(dumped['corr_scores'])} correspondences\n{est}"
        )

    with open(osp.join(args.output_dir, f"{dataset.metadata[0]['seq_id']:02d}_pose"), "w") as f:
        f.write("\n".join(pose_lines) + "\n")
    print(f"wrote {args.output_dir}")


if __name__ == "__main__":
    main()
