#!/usr/bin/env bash
# Scaled held-out-scene evaluation: strengthen the headline generalization
# claim (STATUS "Scene generalization": RR 100% over 12 pairs) by testing
# the SAME snapshot + SAME deployed capacities on many more scenes it has
# never seen, generated from fresh --seed values (disjoint geometry per
# make_synth_kitti --seed semantics). No training — this is pure evidence
# scaling: each root contributes its 3 test scenes x (TEST_FRAMES-1) pairs.
#
# Usage: bash scripts/run_fresh_scene_eval.sh [SNAPSHOT_DIR] [WORKDIR] [SEED...]
set -euo pipefail

SNAP=${1:-/tmp/rdmnet_proc_r5/run_aug/snapshots_best}
WORK=${2:-/tmp/rdmnet_fresh_eval}
shift $(( $# > 2 ? 2 : $# )) || true
SEEDS=("${@:-}")
if [ -z "${SEEDS[*]}" ]; then SEEDS=(999 1000); fi
TEST_FRAMES=11

# the capacities the deployed model was calibrated with (its training root)
CAL=$(python -m rdmnet_tpu.cli.preprocess calibrate --root /tmp/rdmnet_proc_r5/data | tail -1)
echo "deployed calibration: $CAL"

for SEED in "${SEEDS[@]}"; do
    ROOT="$WORK/data_seed$SEED"
    FEATS="$WORK/features_seed$SEED"
    if [ ! -d "$ROOT" ]; then
        # train/val scenes are 1-pair stubs (unused); only test scenes matter
        python scripts/make_synth_kitti.py --out "$ROOT" --procedural 6 \
            --frames 2 --val_frames 2 --test_frames "$TEST_FRAMES" \
            --seed "$SEED"
    fi
    python -m rdmnet_tpu.cli.test --dataset kitti --root "$ROOT" \
        --snapshot_dir "$SNAP" --feature_dir "$FEATS" \
        --bucket_scale 0.7 $CAL
    echo "== seed $SEED eval =="
    python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr \
        --json_out "$FEATS/summary.json"
    # accuracy BANDS, not just the RR cliff: drift below the acceptance
    # thresholds still fails loudly (scripts/check_eval_bands.py rationale)
    python scripts/check_eval_bands.py "$FEATS/summary.json" \
        --rr_min 1.0 --rre_max 0.25 --rte_max 0.07
done

echo "fresh-scene eval artifacts under $WORK"
