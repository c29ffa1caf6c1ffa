#!/usr/bin/env bash
# The augmented-generalization recipe (STATUS round-2 session-7 follow-up):
# train WITH rotation augmentation and gradient accumulation on the 36-pair
# multi-scan synthetic KITTI dataset (3 bundled scans x 12 train pairs,
# fresh rigid motions per split), then test+eval on the 6 held-out-motion
# test pairs. The round-2 no-augmentation run memorized the 18 seen motions
# (test RR 33%); this run targets motion generalization:
#   - --augmentation_rotation 12 (reference config.py:51 semantics: euler
#     angles up to 30 deg/axis) decouples the net from the seen motions
#   - --grad_acc 4 (reference cfg.optim.grad_acc_steps) steadies batch-1
#     gradients (effective batch 4)
#   - warmup-cosine anneal as in scripts/run_synth_demo.sh
#
# Usage: bash scripts/run_synth_generalization_train.sh [WORKDIR] [EPOCHS]
set -euo pipefail

WORK=${1:-/tmp/rdmnet_gen_r3}
EPOCHS=${2:-200}
ROOT="$WORK/data"
RUN="$WORK/run"
FEATS="$WORK/features"

python scripts/make_synth_kitti.py --out "$ROOT" --frames 13 --val_frames 4

python -m rdmnet_tpu.cli.trainval --root "$ROOT" --output_dir "$RUN" \
    --max_epoch "$EPOCHS" --lr 5e-4 --bucket_scale 0.7 \
    --augmentation_rotation 12 --grad_acc 4 \
    --scheduler warmup_cosine --warmup_steps 100 \
    --keep_snapshots 3 --log_steps 20

python scripts/plot_training.py --run "$RUN"

python -m rdmnet_tpu.cli.test --dataset kitti --root "$ROOT" \
    --snapshot_dir "$RUN/snapshots_best" --feature_dir "$FEATS" \
    --bucket_scale 0.7

python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr

echo "generalization-run artifacts under $WORK"
