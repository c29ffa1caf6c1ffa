#!/usr/bin/env bash
# The 2x2 realism cross-evaluation (VERDICT r4 #2, second half): after
# run_enriched_curriculum.sh produces an enriched-trained snapshot, this
# completes the train-regime x eval-regime grid that tests the round-4
# "procedural realism is the binding constraint" claim:
#
#            | plain held-out scenes | enriched held-out scenes
#  ----------+-----------------------+-------------------------
#  plain-    | recipe tail           | this script (cell B)
#  trained   | (RR 100/0.18deg/4.8cm)|
#  enriched- | this script (cell C)  | enriched recipe tail
#  trained   |                       |
#
# Each snapshot runs under ITS OWN deployed calibration against the other
# regime's test split. Results + the ceiling verdict: STATUS.md round-5.
#
# Usage: bash scripts/run_realism_cross_eval.sh \
#          [PLAIN_SNAP] [ENRICHED_SNAP] [PLAIN_ROOT] [ENRICHED_ROOT] [WORK]
set -euo pipefail

PLAIN_SNAP=${1:-/tmp/rdmnet_proc_r5/run_aug/snapshots_best}
ENR_SNAP=${2:-/tmp/rdmnet_enriched/run_aug/snapshots_best}
PLAIN_ROOT=${3:-/tmp/rdmnet_proc_r5/data}
ENR_ROOT=${4:-/tmp/rdmnet_enriched/data}
WORK=${5:-/tmp/rdmnet_cross_eval}

CAL_PLAIN=$(python -m rdmnet_tpu.cli.preprocess calibrate --root "$PLAIN_ROOT" | tail -1)
CAL_ENR=$(python -m rdmnet_tpu.cli.preprocess calibrate --root "$ENR_ROOT" | tail -1)

run_cell() {  # name snapshot root cal
    local NAME=$1 SNAP=$2 ROOT=$3 CAL=$4
    local FEATS="$WORK/features_$NAME"
    python -m rdmnet_tpu.cli.test --dataset kitti --root "$ROOT" \
        --snapshot_dir "$SNAP" --feature_dir "$FEATS" \
        --bucket_scale 0.7 $CAL
    echo "== cross-eval [$NAME] =="
    python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr \
        --json_out "$FEATS/summary.json"
}

# cell B: plain-trained model on enriched held-out scenes
run_cell plain_on_enriched "$PLAIN_SNAP" "$ENR_ROOT" "$CAL_ENR"
# cell C: enriched-trained model on plain held-out scenes
run_cell enriched_on_plain "$ENR_SNAP" "$PLAIN_ROOT" "$CAL_PLAIN"

echo "cross-eval artifacts under $WORK"
