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
# The stress scenes must be NOVEL, not just the FOV regime: per the
# make_synth_kitti --seed semantics, a mulran-layout root built with the
# DEFAULT seed reuses the kitti-layout train-scene draws (the round-3
# stress did exactly that, isolating FOV/motion/vote-off but not scene
# novelty — STATUS honesty note). The default 31337 here is disjoint from
# every seed any training recipe draws from (7351 train roots, 4242
# 12-scene root, 1234 FOV fine-tune), matching the reference's MulRan
# setting: novel scenes AND novel sensor regime (reference README.md:106-108).
#
# Usage: bash scripts/run_mulran_stress.sh SNAPSHOT_DIR [WORKDIR] [SEED]
set -euo pipefail

SNAP=${1:?usage: run_mulran_stress.sh SNAPSHOT_DIR [WORKDIR] [SEED]}
WORK=${2:-/tmp/rdmnet_mulran_stress}
SEED=${3:-31337}
ROOT="$WORK/data"
FEATS="$WORK/features"

python scripts/make_synth_kitti.py --out "$ROOT" --layout mulran \
    --procedural 3 --test_frames 4 --fov_deg 290 --step 6 --seed "$SEED"

python -m rdmnet_tpu.cli.test --dataset mulran --root "$ROOT" \
    --snapshot_dir "$SNAP" --feature_dir "$FEATS" --bucket_scale 0.7

python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr --figures

echo "MulRan-stress artifacts under $WORK"
