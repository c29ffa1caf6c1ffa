#!/usr/bin/env bash
# Scene-generalization demonstration with ZERO external data: ray-cast a
# multi-scene procedural LiDAR dataset (rdmnet_tpu/data/procedural.py — real
# viewpoint-dependent occlusion, DISTINCT scenes per train/val/test
# sequence), calibrate the static capacities on it, train from random init,
# and evaluate on pairs from scenes never seen during training. Unlike
# run_synth_demo.sh (one geometry under held-out motions), the test split
# here measures *scene* generalization — the closest zero-data stand-in for
# the reference's KITTI protocol.
#
# Usage: bash scripts/run_procedural_demo.sh [WORKDIR] [EPOCHS]
set -euo pipefail

WORK=${1:-/tmp/rdmnet_proc_demo}
EPOCHS=${2:-150}
ROOT="$WORK/data"
RUN="$WORK/run"
FEATS="$WORK/features"

# 6 train scenes x 12 pairs + 2 val scenes x 3 + 3 test scenes x 4
python scripts/make_synth_kitti.py --out "$ROOT" --procedural 6 \
    --frames 13 --val_frames 4 --test_frames 5

# per-dataset static capacities (neighbor limits + banded-search caps),
# printed as ready-to-paste flags on the last line
CAL=$(python -m rdmnet_tpu.cli.preprocess calibrate --root "$ROOT" | tail -1)
echo "calibrated: $CAL"

# grad accumulation (4 micro-steps) + mild rotation augmentation (30 deg
# per axis): batch-1 training without augmentation memorizes the seen
# motions (see STATUS.md session-7); warmup-cosine anneals to 10% by the
# end. The test step evaluates the best-validation-RR snapshot.
python -m rdmnet_tpu.cli.trainval --root "$ROOT" --output_dir "$RUN" \
    --max_epoch "$EPOCHS" --lr 5e-4 --augmentation_rotation 12 --grad_acc 4 \
    --bucket_scale 0.7 --scheduler warmup_cosine --warmup_steps 100 \
    --keep_snapshots 3 --log_steps 50 $CAL

python scripts/plot_training.py --run "$RUN"

python -m rdmnet_tpu.cli.test --dataset kitti --root "$ROOT" \
    --snapshot_dir "$RUN/snapshots_best" --feature_dir "$FEATS" \
    --bucket_scale 0.7 $CAL

python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr --figures

echo "held-out-scene results under $FEATS; training curves under $RUN/figures"
