"""Measured sustained rate of the REAL Trainer loop, host loader included.

DESIGN.md "Train-step accounting" derives 256 ms/step from fused-program
timing; this script closes the loop by driving the actual
`engine.trainer.Trainer` (PairLoader prefetch -> host pad-only collate ->
vmapped on-device pyramid build -> jitted train step -> windowed metric
fetches) on a synthetic root at the SAME 0.7 demo bucket and reporting the
Trainer's own windowed steps/s. If the loop is step-bound (host loader and
dispatch fully overlapped), the windowed rate matches 1/step-time = ~3.9
steps/s; a materially lower number would mean loader or fetch overhead —
the regression this script exists to catch.

Setup (host-side, seconds):
    python scripts/make_synth_kitti.py --out /tmp/synth_trmeas --frames 40 \
        --val_frames 2 --test_frames 2
Run (real chip; one cold ~5-10 min train-step compile on first use):
    python scripts/measure_trainer_rate.py [--root /tmp/synth_trmeas]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_trmeas")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--log_steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/trainer_rate")
    args = ap.parse_args()

    from rdmnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.data.datasets import RegistrationPairDataset
    from rdmnet_tpu.data.loader import PairLoader
    from rdmnet_tpu.engine.trainer import Trainer

    cfg = make_cfg()
    cfg = cfg.replace(pyramid=cfg.pyramid.scaled(0.7))
    cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, max_epoch=args.epochs))

    train_dataset = RegistrationPairDataset(
        "kitti", root=args.root, subset="train",
        point_limit=cfg.train.point_limit,
        use_augmentation=True,
        augmentation_noise=cfg.train.augmentation_noise,
        augmentation_min_scale=cfg.train.augmentation_min_scale,
        augmentation_max_scale=cfg.train.augmentation_max_scale,
        augmentation_shift=cfg.train.augmentation_shift,
        augmentation_rotation=cfg.train.augmentation_rotation,
        seed=cfg.seed,
    )
    loader = PairLoader(
        train_dataset, cap=cfg.pyramid.caps[0], batch_size=1,
        shuffle=True, drop_last=True, seed=cfg.seed,
    )
    # no val loader: this measures the train loop; validation/eval compile
    # is out of scope (and out of the windowed rate either way)
    trainer = Trainer(
        cfg, loader, None, output_dir=args.out, log_steps=args.log_steps
    )
    # train.log is opened in append mode by the Trainer's FileHandler, so a
    # re-run against the same --out would otherwise average stale windows
    # from prior runs into "steady"; parse only lines written by THIS run.
    log_path = os.path.join(args.out, "logs", "train.log")
    prior_bytes = os.path.getsize(log_path) if os.path.exists(log_path) else 0
    trainer.run()

    # the Trainer's own windowed rates are the measurement; echo them
    rates = []
    with open(log_path) as f:
        f.seek(prior_bytes)
        for line in f:
            m = re.search(r"\| ([0-9.]+) steps/s", line)
            if m:
                rates.append(float(m.group(1)))
    # first window of each run absorbs compile/warm-up; report the rest
    steady = rates[1:] if len(rates) > 1 else rates
    print(f"windowed rates (steps/s): {rates}")
    if steady:
        print(
            f"steady windowed rate: {sum(steady) / len(steady):.3f} steps/s "
            f"(n={len(steady)} windows of {args.log_steps}; "
            f"fused-step accounting predicts ~{1000 / 256.3:.2f})"
        )


if __name__ == "__main__":
    main()
