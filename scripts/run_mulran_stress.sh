#!/usr/bin/env bash
# MulRan-style FOV/sparsity stress evaluation with zero external data
# (reference's hardest regime: ~70 deg of azimuth lost to the vehicle body,
# README.md:108, vote disabled at inference, test.py:107-108).
#
# Synthesizes procedural 290-deg-FOV asymmetric pairs in the exact MulRan
# on-disk schema at realistic scan density, then drives the full
# test -> eval path with a trained snapshot. The test CLI disables the vote
# branch for --dataset mulran automatically.
#
# Usage: bash scripts/run_mulran_stress.sh SNAPSHOT_DIR [WORKDIR]
set -euo pipefail

SNAP=${1:?usage: run_mulran_stress.sh SNAPSHOT_DIR [WORKDIR]}
WORK=${2:-/tmp/rdmnet_mulran_stress}
ROOT="$WORK/data"
FEATS="$WORK/features"

python scripts/make_synth_kitti.py --out "$ROOT" --layout mulran \
    --procedural 3 --test_frames 4 --fov_deg 290 --step 6

python -m rdmnet_tpu.cli.test --dataset mulran --root "$ROOT" \
    --snapshot_dir "$SNAP" --feature_dir "$FEATS" --bucket_scale 0.7

python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr --figures

echo "MulRan-stress artifacts under $WORK"
