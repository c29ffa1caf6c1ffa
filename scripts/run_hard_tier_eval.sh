#!/usr/bin/env bash
# Hard-tier discriminative benchmark (VERDICT r4 #1): evaluate a snapshot on
# procedurally HARD scene-novel pairs until the accuracy axis has a slope
# again — every round-4 held-out eval saturated at RR 100%, so a benchmark
# where everything passes could no longer detect regressions or demonstrate
# improvements. The reference's own KITTI test split keeps a failure tail
# (RR 99.82, /root/reference/README.md:101-103) and its eval machinery
# exists to measure it (experiments/eval.py:219-237); this is the
# zero-external-data equivalent.
#
# Three rungs of difficulty, all ENRICHED generator (curved corridor,
# non-planar terrain, in-corridor clutter — data/procedural.py enrich=True)
# and all scene-novel (seeds disjoint from every training draw):
#   mid:  full-360, reference pair spacing, light dropout — realism shift only
#   low:  +lower overlap (14 m motion, 300 deg FOV) + more dropout
#   hard: 16 m motion + 290 deg asymmetric FOV + heavy dropout (~24% overlap
#         at this spacing, measured in tests/test_procedural.py terms)
#
# Both vote paths are scored per rung: --use_vote on is the production best
# path (the round-3/4 finding: vote+NMS rescues asymmetric-FOV matching);
# off isolates the reference's MulRan vote-off quirk on the same pairs
# (auto would equal on for these kitti-layout roots). Capacities are
# calibrated PER RUNG (cli.preprocess calibrate), as the reference
# calibrates per dataset — enriched/cropped clouds have different level
# occupancies than the training root. Results: STATUS.md "Hard-tier
# benchmark" (r5); tests/test_hard_tier.py pins the recipe.
#
# Usage: bash scripts/run_hard_tier_eval.sh SNAPSHOT_DIR [WORKDIR]
#   SNAPSHOT_DIR: a snapshots_best dir from any trained run
set -euo pipefail

SNAP=${1:?usage: run_hard_tier_eval.sh SNAPSHOT_DIR [WORKDIR]}
WORK=${2:-/tmp/rdmnet_hard_tier}

# seeds 5150x: disjoint from 7351 (train), 4242 (12-scene), 31337 (stress),
# 999/1000 (fresh evals), 1234 (FOV fine-tune), 97531 (hard-tier fine-tune).
# The "extreme" rung (18 m motion + 270-deg FOV + dropout 0.35, overlap
# ~15%) exists because the enriched+FOV fine-tuned snapshot reached 93.3%
# RR on "hard" — one pair from the saturation ceiling — so the escalation
# contract (tests/test_hard_tier.py) demanded a harder rung pre-emptively.
declare -A STEP=( [mid]=10 [low]=14 [hard]=16 [extreme]=18 )
declare -A FOV=(  [mid]="" [low]="--fov_deg 300" [hard]="--fov_deg 290"
                  [extreme]="--fov_deg 270" )
declare -A DROP=( [mid]=0.2 [low]=0.25 [hard]=0.3 [extreme]=0.35 )
declare -A SEED=( [mid]=51501 [low]=51502 [hard]=51503 [extreme]=51504 )

for RUNG in mid low hard extreme; do
    ROOT="$WORK/data_$RUNG"
    if [ ! -d "$ROOT" ]; then
        # eval-only root: 3 test scenes x 10 pairs (train/val stubs minimal)
        python scripts/make_synth_kitti.py --out "$ROOT" --procedural 3 \
            --frames 2 --val_frames 2 --test_frames 11 \
            --enrich --dropout "${DROP[$RUNG]}" --step "${STEP[$RUNG]}" \
            ${FOV[$RUNG]} --seed "${SEED[$RUNG]}"
    fi
    CAL=$(python -m rdmnet_tpu.cli.preprocess calibrate --root "$ROOT" | tail -1)
    echo "rung $RUNG calibration: $CAL"
    for VOTE in on off; do
        FEATS="$WORK/features_${RUNG}_$VOTE"
        python -m rdmnet_tpu.cli.test --dataset kitti --root "$ROOT" \
            --snapshot_dir "$SNAP" --feature_dir "$FEATS" \
            --bucket_scale 0.7 --use_vote "$VOTE" $CAL
        echo "== hard tier [$RUNG] vote=$VOTE =="
        python -m rdmnet_tpu.cli.eval --feature_dir "$FEATS" --method lgr \
            --json_out "$FEATS/summary.json"
    done
done

echo "hard-tier artifacts under $WORK"
