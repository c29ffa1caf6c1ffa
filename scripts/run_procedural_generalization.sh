#!/usr/bin/env bash
# Scene-generalization at scale: the two-phase curriculum (proven on the
# 36-pair synth set, run_synth_generalization_train.sh) applied to a LARGER
# procedural dataset — 6 distinct ray-cast scenes x 24 train pairs, with val
# and test splits drawn from scenes NEVER seen in training.
#
# Why this exists (STATUS round-3): on the 3-geometry synth set the coarse
# stage never learns (c_loss flat at ~0.92, PIR ~1% through 150 epochs) —
# with every training pair cut from the same three scans there is too little
# geometric diversity for superpoint features to separate, and held-out
# -motion test RR tops out at 50%. Distinct procedural scenes give the
# coarse circle loss real structure to learn, and make the test split a
# held-out-SCENE protocol — the closest zero-data stand-in for the
# reference's KITTI evaluation.
#
# Usage: bash scripts/run_procedural_generalization.sh [WORKDIR] [EPOCHS_A] [EPOCHS_B]
set -euo pipefail

WORK=${1:-/tmp/rdmnet_proc_r3}
EPOCHS_A=${2:-30}
EPOCHS_B=${3:-60}
ROOT="$WORK/data"
RUN_A="$WORK/run_bootstrap"
RUN_B="$WORK/run_aug"
FEATS="$WORK/features"

if [ ! -d "$ROOT" ]; then
    # 6 train scenes x 24 pairs + 2 val scenes x 4 + 3 test scenes x 4
    python scripts/make_synth_kitti.py --out "$ROOT" --procedural 6 \
        --frames 25 --val_frames 5 --test_frames 5
fi

# per-dataset static capacities (neighbor limits + banded-search caps)
CAL=$(python -m rdmnet_tpu.cli.preprocess calibrate --root "$ROOT" | tail -1)
echo "calibrated: $CAL"

# resume-idempotent phases: a rerun RESUMES an interrupted phase (no-op if
# complete) instead of skipping — see run_scaling_12scene.sh for rationale
resume_flag() {
    [ -n "$(ls -A "$1/snapshots" 2>/dev/null)" ] && echo "--resume"
}

# phase A: bootstrap WITHOUT augmentation (the recipe that converges from
# random init; augmentation-from-init plateaued at PIR ~1% twice on the
# synth set)
python -m rdmnet_tpu.cli.trainval --root "$ROOT" --output_dir "$RUN_A" \
    $(resume_flag "$RUN_A") \
    --max_epoch "$EPOCHS_A" --lr 5e-4 --no_augmentation --bucket_scale 0.7 \
    --scheduler warmup_cosine --warmup_steps 200 \
    --keep_snapshots 3 --log_steps 50 $CAL

# phase B: warm-start params (fresh optimizer), rotation-only augmentation
# (30 deg/axis), effective batch 4
python -m rdmnet_tpu.cli.trainval --root "$ROOT" --output_dir "$RUN_B" \
    --init_from "$RUN_A/snapshots_best" $(resume_flag "$RUN_B") \
    --max_epoch "$EPOCHS_B" --lr 2e-4 --bucket_scale 0.7 \
    --augmentation_rotation 12 --augmentation_scale 1,1 \
    --augmentation_shift 0 --grad_acc 4 \
    --scheduler warmup_cosine --warmup_steps 100 \
    --keep_snapshots 3 --log_steps 50 $CAL

python scripts/plot_training.py --run "$RUN_B"

# held-out-scene evaluation of the best-validation snapshot
python -m rdmnet_tpu.cli.test --dataset kitti --root "$ROOT" \
    --snapshot_dir "$RUN_B/snapshots_best" --feature_dir "$FEATS" \
    --bucket_scale 0.7 $CAL

python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr --figures \
    --json_out "$FEATS/summary.json"

# accuracy BANDS on the saturated held-out metric (VERDICT r4 #8): RR 100%
# alone cannot see drift below the 5 deg / 2 m acceptance cliff; the bands
# (~3x the measured run-to-run spread) can — scripts/check_eval_bands.py
python scripts/check_eval_bands.py "$FEATS/summary.json" \
    --rr_min 1.0 --rre_max 0.25 --rte_max 0.07

echo "held-out-scene generalization artifacts under $WORK"
