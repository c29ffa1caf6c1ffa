"""Test-set evaluation + per-pair feature dump (reference:
experiments/test.py:19-115): runs the model over the chosen dataset's test
split, logs PIR/IR/RRE/RTE/RR, and writes reference-schema .npz files for
the offline eval CLI.

Usage:
    python -m rdmnet_tpu.cli.test --dataset kitti --root /data/KITTI \
        [--snapshot_dir DIR] [--test_epoch N] [--feature_dir DIR]

MulRan disables the vote branch at inference (reference test.py:107-108).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import os.path as osp
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.cli.common import (
    build_model_and_params,
    make_cli_cfg,
    pad_pair_np,
    trim_outputs,
)
from rdmnet_tpu.graph.pyramid import build_pair_batch
from rdmnet_tpu.data.datasets import RegistrationPairDataset
from rdmnet_tpu.engine.meters import SummaryBoard, Timer
from rdmnet_tpu.losses import Evaluator


def main():
    from rdmnet_tpu.cli.common import enable_compile_cache
    enable_compile_cache()  # minutes-long TPU compiles -> one-time cost
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="kitti",
                        choices=["kitti", "kitti360", "apollo", "mulran"])
    parser.add_argument("--root", required=True,
                        help="dataset root; a comma-separated list "
                        "concatenates same-schema roots (e.g. joint "
                        "full-360 + FOV-cropped training)")
    parser.add_argument("--snapshot_dir", default=None)
    parser.add_argument("--test_epoch", type=int, default=None)
    parser.add_argument("--feature_dir", default=None)
    parser.add_argument("--subset", default="test")
    # embarrassingly-parallel sharding over pairs: run one process per chip
    # with distinct --shard_id; every shard writes into the shared
    # feature_dir (replaces the reference's mp.spawn DDP test,
    # test_batchoffline.py:255-262)
    parser.add_argument("--num_shards", type=int, default=1)
    parser.add_argument("--shard_id", type=int, default=0)
    # converted reference checkpoint: .pth.tar path; implies the
    # reference-faithful parity config (calibrated neighbor limits, exact
    # search, per-layer kernels) unless --no_parity_cfg
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
    parser.add_argument(
        "--bucket_scale", type=float, default=1.0,
        help="pyramid capacity-bucket factor for this run (e.g. 0.7 fits "
             "typical KITTI test scans at ~2/3 the device time; oversized "
             "scans truncate and count in the dropped telemetry)",
    )
    parser.add_argument(
        "--buckets", default=None,
        help="comma-separated capacity-bucket factors (e.g. 0.7,1.0): one "
             "compiled program per bucket, each pair dispatched to the "
             "smallest bucket that fits — small scans pay small-bucket "
             "device time, big scans avoid truncation (the eval-side "
             "counterpart of rdmnet-export --buckets). Overrides "
             "--bucket_scale",
    )
    parser.add_argument(
        "--use_vote", default="auto", choices=["auto", "on", "off"],
        help="vote branch at inference: auto follows the reference quirk "
             "(disabled for --dataset mulran, reference test.py:107-108); "
             "on/off override it — e.g. to isolate the quirk's effect on "
             "FOV-cropped data",
    )
    parser.add_argument(
        "--vis", action="store_true",
        help="per-pair PLY visualization exports under <feature_dir>/vis "
             "(clouds + green/red correspondence lines — the headless "
             "equivalent of the reference's cfg.test.vis renderings)",
    )
    from rdmnet_tpu.cli.common import add_pyramid_overrides
    add_pyramid_overrides(parser)
    parser.add_argument(
        "--no_compress", action="store_true",
        help="write uncompressed .npz feature dumps (compression is the "
             "reference's format and the eval-loop host bottleneck; "
             "cli/eval reads both)",
    )
    args = parser.parse_args()
    assert 0 <= args.shard_id < args.num_shards

    cfg = make_cli_cfg(args)
    parity = args.parity_cfg or (args.torch_checkpoint and not args.no_parity_cfg)
    if parity and args.dataset != "kitti":
        # the parity preset's neighbor limits are KITTI-calibrated; the
        # reference calibrates per dataset (utils/data.py:195-220) and
        # wrong limits measurably shift features under converted
        # weights (STATUS.md) — recalibrate before trusting metrics
        print(
            f"WARNING: parity preset uses KITTI-calibrated neighbor "
            f"limits; for {args.dataset} run `preprocess calibrate` "
            f"and set PyramidConfig.neighbor_limits accordingly"
        )
    vote_on = (args.dataset != "mulran") if args.use_vote == "auto" \
        else (args.use_vote == "on")
    if not vote_on:
        # vote disabled at inference for MulRan (reference test.py:107-108)
        cfg = cfg.replace(vote=dataclasses.replace(cfg.vote, inference_use_vote=False))
    cfgs = None
    if args.buckets:
        # per-pair static-shape bucket dispatch (see run_eval_loop)
        scales = sorted(float(s) for s in args.buckets.split(","))
        cfgs = [cfg.replace(pyramid=cfg.pyramid.scaled(s)) for s in scales]
        cfg = cfgs[-1]
    elif args.bucket_scale != 1.0:
        # static-shape capacity bucket for the whole run (the same
        # PyramidConfig.scaled bucketing bench.py applies): typical KITTI
        # test scans (~20k points) fit 0.7x caps at ~2/3 the device time.
        # Scans beyond the bucket truncate and count in `dropped`.
        cfg = cfg.replace(pyramid=cfg.pyramid.scaled(args.bucket_scale))

    feature_dir = args.feature_dir or f"output/features{args.dataset}"
    os.makedirs(feature_dir, exist_ok=True)

    # subset "infer" = the bundled demo pairs (no dataset mount needed) —
    # smoke path for driving this CLI end-to-end, mirrors cli/infer
    extra = {"demo_asset_dir": args.root} if args.subset == "infer" else {}
    dataset = RegistrationPairDataset(
        args.dataset, root=args.root, subset=args.subset,
        point_limit=cfg.test.point_limit, **extra,
    )
    model, params = build_model_and_params(
        cfg, args.snapshot_dir, args.test_epoch,
        torch_checkpoint=args.torch_checkpoint,
    )
    indices = list(range(args.shard_id, len(dataset), args.num_shards))
    board = run_eval_loop(
        cfg, model, params, dataset, indices, feature_dir,
        compress=not args.no_compress,
        vis_dir=osp.join(feature_dir, "vis") if args.vis else None,
        cfgs=cfgs,
    )
    print("== summary ==")
    print(board.format())


def _nearest_owner(points: np.ndarray, nodes: np.ndarray, chunk=4096):
    """Owner node id per point (argmin distance), chunked host numpy."""
    owners = np.empty(len(points), np.int64)
    for s in range(0, len(points), chunk):
        d = np.linalg.norm(points[s:s + chunk, None] - nodes[None], axis=2)
        owners[s:s + chunk] = d.argmin(axis=1)
    return owners


def _export_pair_vis(pair_dir, dumped, vis, transform, acceptance_radius):
    """One pair's PLY exports: the headless equivalents of the reference's
    three cfg.test.vis renderings (model.py:224-231 vote, :275-276
    grouping, :369-384 correspondences)."""
    from rdmnet_tpu.utils.se3_np import apply_transform
    from rdmnet_tpu.utils.visualization import (
        export_correspondences,
        export_grouping,
        export_votes,
    )

    resid = np.linalg.norm(
        apply_transform(dumped["src_corr_points"], transform)
        - dumped["ref_corr_points"], axis=1,
    )
    export_correspondences(
        pair_dir,
        dumped["ref_points"], dumped["src_points"],
        dumped["ref_corr_points"], dumped["src_corr_points"],
        corr_correct=resid < acceptance_radius,
    )
    # the INTERACTIVE half of the reference's cfg.test.vis (o3d windows,
    # visualization.py:139-436): one self-contained HTML per pair — src
    # aligned by the ESTIMATED transform, green/red lines by GT residual,
    # NMS-survivor node layers; opens from disk in any browser
    from rdmnet_tpu.utils.html_viewer import export_pair_html

    est = dumped["estimated_transform"]
    extra = {}
    for side in ("ref", "src"):
        if f"vis_{side}_shifted" in vis:
            nodes = vis[f"vis_{side}_shifted"][vis[f"vis_{side}_keep"]]
            if side == "src":
                nodes = apply_transform(nodes, est)
            extra[f"{side} NMS survivors"] = nodes
    export_pair_html(
        osp.join(pair_dir, "viewer.html"),
        dumped["ref_points"],
        apply_transform(dumped["src_points"], est),
        corr_ref=dumped["ref_corr_points"],
        corr_src_aligned=apply_transform(dumped["src_corr_points"], est),
        corr_correct=resid < acceptance_radius,
        extra_layers=extra,
        title=osp.basename(pair_dir),
    )
    for side in ("ref", "src"):
        if f"vis_{side}_shifted" in vis:
            export_votes(
                pair_dir, vis[f"vis_{side}_nodes"], vis[f"vis_{side}_shifted"],
                keep_mask=vis[f"vis_{side}_keep"], prefix=f"{side}_",
            )
        # grouping over the final node set (reference draws original and
        # shifted variants; the final set is the one the matcher consumes)
        points = dumped[f"{side}_points_f"]
        nodes = dumped[f"{side}_points_c"]
        if len(nodes):
            export_grouping(pair_dir, points, _nearest_owner(points, nodes),
                            prefix=f"{side}_")


def _make_eval_forward(cfg, model, evaluator):
    @jax.jit
    def forward(params, rp, rc, sp, sc, transform):
        # exact f32 matmuls at eval: the TPU default (bf16 products) costs
        # ~1e-3 relative feature error — measured ~7% slower, but reported
        # metrics then reflect the trained function exactly
        with jax.default_matmul_precision(cfg.eval_matmul_precision):
            batch = build_pair_batch(rp, rc, sp, sc, transform, cfg.pyramid)
            out = model.apply(params, batch, training=False, with_gt=True)
            metrics = evaluator(out, batch, evaling=True)
        # capacity-overflow telemetry (silent-degradation guard): nonzero
        # means a pyramid level clipped real voxels — resize bucket caps
        metrics["dropped"] = (
            jnp.sum(batch.ref.dropped) + jnp.sum(batch.src.dropped)
        ).astype(jnp.float32)
        return out, metrics

    return forward


def run_eval_loop(cfg, model, params, dataset, indices, feature_dir,
                  compress=True, log=print, vis_dir=None, cfgs=None):
    """Dump features + metrics for ``indices`` of ``dataset`` (the tester
    body of reference test.py:19-115). Returns the SummaryBoard.

    Pipelining: the forward for pair i+1 is dispatched BEFORE pair i's
    host-side fetch/trim (jax dispatch is async), and the compressed npz
    write (~1 s/pair, the host bottleneck) runs in a small worker pool —
    two workers keep one write in flight while the next pair trims;
    bounded in-flight futures cap host memory on long shards.

    ``cfgs``: optional list of capacity-bucket variants of ``cfg`` (same
    model/params, different ``pyramid`` caps). Each pair runs at the
    smallest bucket that fits both clouds — one compiled program per
    bucket, masked-pad invariance keeps results identical across buckets
    (the eval-side counterpart of the multi-bucket serving artifacts)."""
    from rdmnet_tpu.data.loader import choose_bucket

    evaluator = Evaluator(cfg)
    cfgs = sorted(cfgs or [cfg], key=lambda c: c.pyramid.caps[0])
    caps = [c.pyramid.caps[0] for c in cfgs]
    forwards = [_make_eval_forward(c, model, evaluator) for c in cfgs]

    board = SummaryBoard()
    timer = Timer()
    timer.tic()
    savez = np.savez_compressed if compress else np.savez
    writer = ThreadPoolExecutor(max_workers=2)
    writes = []

    def finalize(pending, n_done):
        out, metrics, item, trunc0, cap, prep_s, proc_s = pending
        # one batched fetch (per-key float() would round-trip per scalar)
        metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        metrics["dropped"] += trunc0
        board.update_from_dict(metrics)
        dumped = trim_outputs(out, item["transform"], vis=vis_dir is not None)
        name = f"{item['seq_id']}_{item['src_frame']}_{item['ref_frame']}"
        # vis_* extras feed only the PLY exports, never the npz schema
        vis = {k: dumped.pop(k) for k in list(dumped) if k.startswith("vis_")}
        writes.append(
            writer.submit(savez, osp.join(feature_dir, name + ".npz"), **dumped)
        )
        if vis_dir:
            # headless stand-in for the reference's cfg.test.vis o3d windows
            # (visualization.py:296-436): per-pair PLY exports — green/red
            # correspondence lines by GT residual at the eval radius, vote
            # offsets + NMS survivors, point-to-node groupings
            writes.append(writer.submit(
                _export_pair_vis, osp.join(vis_dir, name), dumped, vis,
                item["transform"], cfg.eval.acceptance_radius,
            ))
        # backpressure: each queued future pins a full per-pair dump in
        # memory — when writes outpace the pool, block on the oldest
        # instead of growing unboundedly over a long shard
        while len(writes) > 4:
            writes.pop(0).result()
        bucket = f" | cap {cap}" if len(caps) > 1 else ""
        log(
            f"[{n_done}/{len(indices)}] {name} | "
            + ", ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
            + f" | prep {prep_s:.3f}s proc {proc_s:.3f}s"
            + bucket
        )

    pending = None
    for n_done, i in enumerate(indices):
        item = dataset[i]
        bi = choose_bucket(
            max(len(item["ref_points"]), len(item["src_points"])), caps
        )
        rp, rc, sp, sc = pad_pair_np(cfgs[bi], item["ref_points"], item["src_points"])
        trunc0 = (max(0, len(item["ref_points"]) - len(rp))
                  + max(0, len(item["src_points"]) - len(sp)))
        timer.record_prepare()
        out, metrics = forwards[bi](params, rp, rc, sp, sc, item["transform"])
        timer.record_process()
        if pending is not None:
            finalize(pending, n_done)
        # the pair's OWN last-interval times ride with it so finalize (which
        # runs one iteration later, double-buffered) logs them on the right
        # line — reading the timer at log time would print the NEXT pair's
        # intervals under this pair's name/bucket
        pending = (out, metrics, item, trunc0, caps[bi],
                   timer.last_prepare(), timer.last_process())
    if pending is not None:
        finalize(pending, len(indices))
    for w in writes:
        w.result()  # surface any write error before declaring success
    writer.shutdown()
    return board


if __name__ == "__main__":
    main()
