#!/usr/bin/env bash
# Cross-dataset evaluation workflow with ZERO external data: take a trained
# snapshot (e.g. from scripts/run_synth_demo.sh) and evaluate it through the
# KITTI-360 / Apollo / MulRan dataset paths — each synthesized in its exact
# on-disk schema from the bundled scans — mirroring the reference's
# generalization protocol (KITTI-trained weights evaluated on all four
# datasets, README.md:99-108). MulRan exercises the vote-disabled inference
# quirk (reference test.py:107-108) end-to-end.
#
# Usage: bash scripts/run_synth_generalization.sh [SNAPSHOT_DIR] [WORKDIR]
set -euo pipefail

SNAP=${1:-/tmp/rdmnet_synth_demo/run/snapshots_best}
WORK=${2:-/tmp/rdmnet_synth_gen}

for ds in kitti360 apollo mulran; do
    ROOT="$WORK/$ds/data"
    FEATS="$WORK/$ds/features"
    python scripts/make_synth_kitti.py --out "$ROOT" --layout "$ds"
    python -m rdmnet_tpu.cli.test --dataset "$ds" --root "$ROOT" \
        --snapshot_dir "$SNAP" --feature_dir "$FEATS" --bucket_scale 0.7
    python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr
done

echo "generalization features + metrics under $WORK/{kitti360,apollo,mulran}"
