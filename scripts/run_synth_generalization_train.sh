#!/usr/bin/env bash
# Motion-generalization training recipe (STATUS round-2 session-7 follow-up)
# on the 36-pair multi-scan synthetic KITTI dataset (3 bundled scans x 12
# train pairs, fresh rigid motions per split), evaluated on the 6
# held-out-motion test pairs.
#
# Two-phase curriculum — measured on this data scale (see STATUS):
# * single-phase training WITH augmentation from random init plateaus
#   (c_loss ~0.915, PIR ~1%, 30+ epochs; observed twice: round-2 session-6
#   full augmentation, round-3 rotation-12 + scale + shift), while the
#   no-augmentation recipe bootstraps by epoch ~22;
# * so phase A bootstraps WITHOUT augmentation (the proven recipe), and
#   phase B warm-starts from phase A's best-val snapshot (--init_from:
#   params only, fresh optimizer) with ROTATION-ONLY augmentation
#   (30 deg/axis; scale/shift off — their regularization is for real-data
#   diversity the 3-scene synth set cannot absorb) + --grad_acc 4 to
#   steady the batch-1 gradients.
#
# Usage: bash scripts/run_synth_generalization_train.sh [WORKDIR] [EPOCHS_A] [EPOCHS_B]
set -euo pipefail

WORK=${1:-/tmp/rdmnet_gen_r3}
EPOCHS_A=${2:-60}
EPOCHS_B=${3:-150}
ROOT="$WORK/data"
RUN_A="$WORK/run_bootstrap"
RUN_B="$WORK/run_aug"
FEATS="$WORK/features"

if [ ! -d "$ROOT" ]; then
    python scripts/make_synth_kitti.py --out "$ROOT" --frames 13 --val_frames 4
fi

# phase A: bootstrap on seen motions (no augmentation; converges ~epoch 22)
python -m rdmnet_tpu.cli.trainval --root "$ROOT" --output_dir "$RUN_A" \
    --max_epoch "$EPOCHS_A" --lr 5e-4 --no_augmentation --bucket_scale 0.7 \
    --scheduler warmup_cosine --warmup_steps 100 \
    --keep_snapshots 3 --log_steps 20

# phase B: motion generalization (rotation-only augmentation, fresh
# warmup-cosine at a fine-tune lr, effective batch 4)
python -m rdmnet_tpu.cli.trainval --root "$ROOT" --output_dir "$RUN_B" \
    --init_from "$RUN_A/snapshots_best" \
    --max_epoch "$EPOCHS_B" --lr 2e-4 --bucket_scale 0.7 \
    --augmentation_rotation 12 --augmentation_scale 1,1 \
    --augmentation_shift 0 --grad_acc 4 \
    --scheduler warmup_cosine --warmup_steps 50 \
    --keep_snapshots 3 --log_steps 20

python scripts/plot_training.py --run "$RUN_B"

python -m rdmnet_tpu.cli.test --dataset kitti --root "$ROOT" \
    --snapshot_dir "$RUN_B/snapshots_best" --feature_dir "$FEATS" \
    --bucket_scale 0.7

python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr

echo "generalization-run artifacts under $WORK"
