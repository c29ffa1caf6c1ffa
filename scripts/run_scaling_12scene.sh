#!/usr/bin/env bash
# Data-scaling experiment: does scene diversity improve held-out-scene
# accuracy at a FIXED optimizer-step budget?
#
# The proven 6-scene/144-pair curriculum (run_procedural_generalization.sh:
# phase A 30 epochs + phase B 60 epochs = ~4.3k + 8.6k steps) is re-run on
# 12 scenes x 49 pairs = 588 train pairs via multi-root concatenation
# (/tmp/rdmnet_proc_big seed-7351 train scenes + a DISJOINT seed-4242 root),
# with epochs scaled down (A=8, B=15) so the total step count matches the
# 144-pair run — any metric movement is then attributable to data
# diversity, not extra compute.
#
# Held-out-scene protocol is preserved: seed-7351 draws are shared between
# proc_big and the r3 root (same RandomState order), so proc_big trains on
# the SAME scenes 0-5 while the r3 test split (scenes 8-10) stays unseen;
# the seed-4242 scenes are disjoint from both by construction. Eval covers
# the r3 test split AND the fresh-seed roots (999/1000) used for the
# 6-scene evidence, so the scaling comparison is apples-to-apples.
#
# Usage: bash scripts/run_scaling_12scene.sh [WORKDIR] [EPOCHS_A] [EPOCHS_B]
set -euo pipefail

WORK=${1:-/tmp/rdmnet_scale12}
EPOCHS_A=${2:-8}
EPOCHS_B=${3:-15}
ROOT_A=/tmp/rdmnet_proc_big/data     # 6 scenes x 49 pairs (seed 7351)
ROOT_B=/tmp/rdmnet_proc_4242/data    # 6 scenes x 49 pairs (seed 4242)
EVAL_ROOT=/tmp/rdmnet_proc_r3/data   # test split: held-out scenes 08-10
RUN_A="$WORK/run_bootstrap"
RUN_B="$WORK/run_aug"

# roots are deterministic in --seed: regenerate any that are missing
if [ ! -d "$ROOT_A" ]; then
    python scripts/make_synth_kitti.py --out "$ROOT_A" --procedural 6 \
        --frames 50 --val_frames 5 --test_frames 5            # seed 7351
fi
if [ ! -d "$ROOT_B" ]; then
    python scripts/make_synth_kitti.py --out "$ROOT_B" --procedural 6 \
        --frames 50 --val_frames 5 --test_frames 5 --seed 4242
fi
if [ ! -d "$EVAL_ROOT" ]; then
    python scripts/make_synth_kitti.py --out "$EVAL_ROOT" --procedural 6 \
        --frames 25 --val_frames 5 --test_frames 5            # seed 7351
fi

CAL=$(python -m rdmnet_tpu.cli.preprocess calibrate --root "$ROOT_A,$ROOT_B" | tail -1)
echo "calibrated: $CAL"

# resume-idempotent phases: a rerun of this recipe RESUMES an interrupted
# phase (and no-ops a completed one — Trainer.run exits when epoch >=
# max_epoch) instead of skipping it outright, so a partial bootstrap can
# never silently feed phase B (directory-existence guards had exactly that
# failure mode when a run died mid-phase)
resume_flag() {  # resume only when a snapshot exists to restore from
    [ -n "$(ls -A "$1/snapshots" 2>/dev/null)" ] && echo "--resume"
}

# phase A: no-aug bootstrap from random init (same recipe, 4x data)
python -m rdmnet_tpu.cli.trainval --root "$ROOT_A,$ROOT_B" \
    --output_dir "$RUN_A" $(resume_flag "$RUN_A") \
    --max_epoch "$EPOCHS_A" --lr 5e-4 --no_augmentation --bucket_scale 0.7 \
    --scheduler warmup_cosine --warmup_steps 200 \
    --keep_snapshots 3 --log_steps 100 $CAL

# phase B: warm start, rotation-only augmentation, effective batch 4
# (--init_from is ignored when resuming, cli/trainval.py:213)
python -m rdmnet_tpu.cli.trainval --root "$ROOT_A,$ROOT_B" \
    --output_dir "$RUN_B" --init_from "$RUN_A/snapshots_best" \
    $(resume_flag "$RUN_B") \
    --max_epoch "$EPOCHS_B" --lr 2e-4 --bucket_scale 0.7 \
    --augmentation_rotation 12 --augmentation_scale 1,1 \
    --augmentation_shift 0 --grad_acc 4 \
    --scheduler warmup_cosine --warmup_steps 100 \
    --keep_snapshots 3 --log_steps 100 $CAL

# eval 1: the r3 held-out-scene test split (6-scene baseline: RR 100%,
# RRE 0.184 deg, RTE 4.84 cm)
python -m rdmnet_tpu.cli.test --dataset kitti --root "$EVAL_ROOT" \
    --snapshot_dir "$RUN_B/snapshots_best" --feature_dir "$WORK/features_r3" \
    --bucket_scale 0.7 $CAL
echo "== eval: r3 held-out scenes =="
python -m rdmnet_tpu.cli.eval --feature_dir "$WORK/features_r3" --method lgr \
    --json_out "$WORK/features_r3/summary.json"
python scripts/check_eval_bands.py "$WORK/features_r3/summary.json" \
    --rr_min 1.0 --rre_max 0.25 --rte_max 0.07

# eval 2: the SAME fresh-seed pairs used for the 6-scene evidence
# (run_fresh_scene_eval.sh roots: 3 test scenes x 10 pairs per seed;
# 6-scene baseline: RR 100%, RRE ~0.17 deg, RTE ~5.4 cm), under THIS
# model's deployed calibration
for SEED in 999 1000; do
    FRESH=/tmp/rdmnet_fresh_eval/data_seed$SEED
    if [ ! -d "$FRESH" ]; then
        python scripts/make_synth_kitti.py --out "$FRESH" --procedural 6 \
            --frames 2 --val_frames 2 --test_frames 11 --seed "$SEED"
    fi
    python -m rdmnet_tpu.cli.test --dataset kitti --root "$FRESH" \
        --snapshot_dir "$RUN_B/snapshots_best" \
        --feature_dir "$WORK/features_fresh_$SEED" \
        --bucket_scale 0.7 $CAL
    echo "== eval: fresh scenes seed $SEED =="
    python -m rdmnet_tpu.cli.eval --feature_dir "$WORK/features_fresh_$SEED" \
        --method lgr --json_out "$WORK/features_fresh_$SEED/summary.json"
    python scripts/check_eval_bands.py \
        "$WORK/features_fresh_$SEED/summary.json" \
        --rr_min 1.0 --rre_max 0.25 --rte_max 0.07
done

echo "12-scene scaling artifacts under $WORK"
