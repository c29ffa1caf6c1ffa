"""Export the inference pipeline as a self-contained serving artifact.

Usage:
    rdmnet-export --out_dir output/export [--snapshot_dir DIR]
                  [--torch_checkpoint F] [--platforms tpu,cpu] [--check]

The artifact (StableHLO + weights.npz + serving.json, see
rdmnet_tpu/serving.py) runs under bare jax with no model code; ``--check``
round-trips the bundled demo pair through the deserialized artifact and
compares its pose against the live pipeline.
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    from rdmnet_tpu.cli.common import enable_compile_cache
    enable_compile_cache()  # minutes-long TPU compiles -> one-time cost
    parser = argparse.ArgumentParser()
    from rdmnet_tpu.cli.common import add_pyramid_overrides
    add_pyramid_overrides(parser)
    parser.add_argument("--out_dir", default="output/export")
    parser.add_argument("--snapshot_dir", default=None)
    parser.add_argument("--test_epoch", type=int, default=None)
    parser.add_argument("--torch_checkpoint", default=None)
    parser.add_argument("--no_parity_cfg", action="store_true")
    parser.add_argument("--parity_cfg", action="store_true")
    parser.add_argument(
        "--platforms", default="tpu,cpu",
        help="comma-separated lowering targets baked into the artifact",
    )
    parser.add_argument(
        "--buckets", default="1.0",
        help="comma-separated capacity-bucket scale factors (e.g. 0.5,0.7,1.0): "
             "one compiled program per bucket over shared weights; the server "
             "dispatches each request to the smallest bucket that fits",
    )
    parser.add_argument(
        "--check", action="store_true",
        help="run the demo pair through the reloaded artifact and compare "
             "its pose against the live pipeline",
    )
    parser.add_argument("--asset_dir", default="/root/reference/assets/pc")
    parser.add_argument(
        "--coarse_module", default=None,
        choices=["thdroformer", "geotransformer", "ape"],
        help="coarse transformer family (ablation; default thdroformer)",
    )
    args = parser.parse_args()

    from rdmnet_tpu.cli.common import build_model_and_params, make_cli_cfg
    from rdmnet_tpu.serving import export_inference, load_exported

    cfg = make_cli_cfg(args)

    _, params = build_model_and_params(
        cfg, args.snapshot_dir, args.test_epoch,
        torch_checkpoint=args.torch_checkpoint,
    )
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    bucket_scales = tuple(float(s) for s in args.buckets.split(",") if s.strip())
    buckets = export_inference(
        cfg, params, args.out_dir, platforms=platforms, bucket_scales=bucket_scales
    )
    print(
        f"exported: {args.out_dir} (platforms={','.join(platforms)}, "
        f"buckets={args.buckets})"
    )

    if args.check:
        import dataclasses
        import os.path as osp

        from rdmnet_tpu.cli.common import make_forward, pad_pair_np
        from rdmnet_tpu.models import RDMNet

        serve, meta = load_exported(args.out_dir)
        ref = np.load(osp.join(args.asset_dir, "000000.npy"))[:, :3]
        src = np.load(osp.join(args.asset_dir, "000004.npy"))[:, :3]
        out = serve(ref, src)
        est = out["estimated_transform"]

        # compare against the live pipeline at the SAME capacity bucket the
        # artifact dispatched to (a different bucket would not be
        # bit-comparable: padded shapes enter the approx top-k reductions)
        scale = next(b["scale"] for b in buckets if b["cap"] == serve.last_cap)
        cfg_check = cfg if scale == 1.0 else dataclasses.replace(
            cfg, pyramid=cfg.pyramid.scaled(scale)
        )
        model = RDMNet(cfg_check)
        forward = make_forward(cfg_check, model, with_gt=False)
        rp, rc, sp, sc = pad_pair_np(cfg_check, ref, src)
        live = forward(params, rp, rc, sp, sc, np.eye(4, dtype=np.float32))
        delta = float(np.abs(est - np.asarray(live["estimated_transform"])).max())
        n_corr = int((out["corr_scores"] > 0).sum())
        print(f"check: {n_corr} correspondences, |pose - live|_max = {delta:.2e}")
        assert delta < 1e-4, "exported artifact diverges from live pipeline"
        print("check: OK")


if __name__ == "__main__":
    main()
