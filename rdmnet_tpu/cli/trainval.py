"""Training CLI (reference: experiments/trainval.py:15-69).

Usage:
    python -m rdmnet_tpu.cli.trainval --root /data/KITTI_odometry \
        [--output_dir DIR] [--resume] [--max_epoch N] [--multihost]

Multi-host pods: launch the same command on every host of the slice with
``--multihost`` (replaces the reference's torch.distributed.launch + NCCL
bootstrap, geotransformer/engine/base_trainer.py:63-78). On Cloud TPU the
coordinator/process info is discovered from the TPU environment; override
with --coordinator_address/--num_processes/--process_id for manual setups.
Each host then loads its own data shard (PairLoader num_hosts/host_id) and
the global mesh spans all hosts' devices — DCN between hosts, ICI within.
"""

from __future__ import annotations

import argparse
import dataclasses

from rdmnet_tpu.config import make_cfg
from rdmnet_tpu.data.datasets import RegistrationPairDataset
from rdmnet_tpu.data.loader import PairLoader
from rdmnet_tpu.engine.trainer import Trainer


def main():
    from rdmnet_tpu.cli.common import enable_compile_cache
    enable_compile_cache()  # minutes-long TPU compiles -> one-time cost
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="kitti")
    parser.add_argument("--root", required=True,
                        help="dataset root; a comma-separated list "
                        "concatenates same-schema roots (e.g. joint "
                        "full-360 + FOV-cropped training)")
    parser.add_argument("--output_dir", default="output/rdmnet_tpu")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument(
        "--lr", type=float, default=None,
        help="base learning rate (default: the reference's Adam 1e-4, "
             "config.py:78; scaled by dp world size like its DDP path)",
    )
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--log_steps", type=int, default=10)
    parser.add_argument(
        "--keep_snapshots", type=int, default=None,
        help="keep only the newest N epoch snapshots (default: keep all, "
             "like the reference's per-epoch .pth.tar files)",
    )
    parser.add_argument(
        "--no_augmentation", action="store_true",
        help="disable train-time augmentation (the reference's "
             "cfg.train.use_augmentation switch, config.py:47)",
    )
    parser.add_argument(
        "--augmentation_rotation", type=float, default=None,
        help="rotation-augmentation factor (reference config.py:51 "
             "semantics: euler angles up to 2*pi/factor; 1.0 = full "
             "rotations, 12 = up to 30 deg per axis)",
    )
    parser.add_argument(
        "--augmentation_scale", default=None,
        help="global-scale augmentation range as MIN,MAX (reference "
             "aug 0.8,1.2); '1,1' disables scaling",
    )
    parser.add_argument(
        "--augmentation_shift", type=float, default=None,
        help="per-cloud random-shift bound in meters (reference 2.0); "
             "0 disables",
    )
    parser.add_argument(
        "--augmentation_noise", type=float, default=None,
        help="uniform point-jitter amplitude in meters (reference 0.01)",
    )
    parser.add_argument(
        "--init_from", default=None,
        help="warm-start MODEL PARAMS from another run's snapshot dir "
             "(e.g. <run>/snapshots_best) with a fresh optimizer/schedule — "
             "curriculum phases and fine-tuning; unlike --resume, the "
             "source run's optimizer structure and epoch counter are "
             "ignored",
    )
    parser.add_argument(
        "--grad_acc", type=int, default=None,
        help="gradient-accumulation micro-steps per applied update "
             "(reference cfg.optim.grad_acc_steps, config.py:82; "
             "optax.MultiSteps here)",
    )
    parser.add_argument(
        "--bucket_scale", type=float, default=1.0,
        help="pyramid capacity-bucket factor for the whole run (same "
             "static-shape bucketing as cli.test; 0.7 fits typical KITTI "
             "scans at ~2/3 the device time per step)",
    )
    from rdmnet_tpu.cli.common import add_pyramid_overrides, apply_pyramid_overrides

    add_pyramid_overrides(parser)
    parser.add_argument(
        "--dp", type=int, default=None,
        help="data-parallel mesh size: N devices, -1 = all, 1 = off (default)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed for a multi-host pod slice",
    )
    parser.add_argument(
        "--coarse_module", default=None,
        choices=["thdroformer", "geotransformer", "ape"],
        help="coarse transformer family (ablation; default thdroformer)",
    )
    parser.add_argument(
        "--scheduler", default=None, choices=["step", "warmup_cosine"],
        help="LR schedule family: the reference's StepLR (default) or its "
        "warmup-cosine alternative (geotransformer/utils/torch.py:153-178)",
    )
    parser.add_argument(
        "--warmup_steps", type=int, default=None,
        help="warmup micro-steps for --scheduler warmup_cosine",
    )
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args()

    if args.multihost:
        # must run BEFORE any device query on this host
        from rdmnet_tpu.parallel import initialize_distributed

        kwargs = {}
        if args.coordinator_address is not None:
            kwargs["coordinator_address"] = args.coordinator_address
        if args.num_processes is not None:
            kwargs["num_processes"] = args.num_processes
        if args.process_id is not None:
            kwargs["process_id"] = args.process_id
        initialize_distributed(**kwargs)

    cfg = apply_pyramid_overrides(make_cfg(), args)
    if args.max_epoch is not None:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, max_epoch=args.max_epoch))
    if args.lr is not None:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, lr=args.lr))
    if args.no_augmentation:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, use_augmentation=False))
    if args.augmentation_rotation is not None:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, augmentation_rotation=args.augmentation_rotation))
    if args.augmentation_scale is not None:
        lo, hi = (float(v) for v in args.augmentation_scale.split(","))
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, augmentation_min_scale=lo, augmentation_max_scale=hi))
    if args.augmentation_shift is not None:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, augmentation_shift=args.augmentation_shift))
    if args.augmentation_noise is not None:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, augmentation_noise=args.augmentation_noise))
    if args.grad_acc is not None:
        cfg = cfg.replace(
            optim=dataclasses.replace(cfg.optim, grad_acc_steps=args.grad_acc))
    if args.bucket_scale != 1.0:
        cfg = cfg.replace(pyramid=cfg.pyramid.scaled(args.bucket_scale))
    if args.dp is not None:
        cfg = cfg.replace(parallel=dataclasses.replace(cfg.parallel, dp=args.dp))
    if args.scheduler is not None:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, scheduler=args.scheduler))
    if args.warmup_steps is not None:
        cfg = cfg.replace(
            optim=dataclasses.replace(cfg.optim, warmup_steps=args.warmup_steps)
        )
    if args.coarse_module is not None:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, coarse_module=args.coarse_module)
        )
    batch_size = args.batch_size or cfg.train.batch_size

    import jax

    num_hosts = jax.process_count()
    host_id = jax.process_index()

    train_dataset = RegistrationPairDataset(
        args.dataset, root=args.root, subset="train",
        point_limit=cfg.train.point_limit,
        use_augmentation=cfg.train.use_augmentation,
        augmentation_noise=cfg.train.augmentation_noise,
        augmentation_min_scale=cfg.train.augmentation_min_scale,
        augmentation_max_scale=cfg.train.augmentation_max_scale,
        augmentation_shift=cfg.train.augmentation_shift,
        augmentation_rotation=cfg.train.augmentation_rotation,
        seed=cfg.seed + host_id,
    )
    val_dataset = RegistrationPairDataset(
        args.dataset, root=args.root, subset="val",
        point_limit=cfg.train.point_limit,
    )
    train_loader = PairLoader(
        train_dataset, cap=cfg.pyramid.caps[0], batch_size=batch_size,
        shuffle=True, drop_last=True, seed=cfg.seed,
        num_hosts=num_hosts, host_id=host_id,
    )
    val_loader = PairLoader(
        val_dataset, cap=cfg.pyramid.caps[0], batch_size=batch_size,
        num_hosts=num_hosts, host_id=host_id,
    )

    trainer = Trainer(
        cfg, train_loader, val_loader,
        output_dir=args.output_dir, log_steps=args.log_steps,
        keep_snapshots=args.keep_snapshots,
    )
    if args.init_from and not args.resume:
        trainer.warm_start(args.init_from)
    trainer.run(resume=args.resume)


if __name__ == "__main__":
    main()
