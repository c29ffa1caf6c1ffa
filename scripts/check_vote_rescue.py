"""Assert the vote-on FOV rescue (round-3 finding) as an executable check.

STATUS round-3 measured that the reference's MulRan vote-off quirk
(reference experiments/test.py:107-108) is the entire remaining stress gap
on asymmetric-FOV pairs: with the FOV-fine-tuned snapshot, vote OFF gives
PIR ~3% / RR 55.6% while `--use_vote on` gives PIR ~58% / RR 100% — without
vote+NMS superpoint selection the coarse matcher collapses when the two
scans see different azimuth sectors. This script mechanizes that claim:
it runs the SAME snapshot over the SAME stress pairs with the vote branch
on and off and FAILS unless vote-on PIR exceeds vote-off PIR by the margin.

Wired into scripts/run_fov_finetune.sh so the regression check runs
whenever the recipe runs; writes a JSON artifact that
tests/test_vote_rescue.py re-asserts in the slow suite.

Usage: python scripts/check_vote_rescue.py SNAPSHOT_DIR ROOT \
          [--bucket_scale 0.7] [--pairs N] [--out vote_rescue.json]
"""

import argparse
import dataclasses
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def mean_pir(cfg, params, dataset, indices):
    import jax

    from rdmnet_tpu.cli.common import pad_pair_np
    from rdmnet_tpu.cli.test import _make_eval_forward
    from rdmnet_tpu.losses import Evaluator
    from rdmnet_tpu.models import RDMNet

    # the vote knob gates the MODEL's own node-selection branch
    # (models/rdmnet.py use_vote), so each arm must REBUILD the model from
    # its toggled cfg — exactly what cli/test.py main does. Passing one
    # prebuilt model with per-arm cfgs silently evaluated vote-ON twice
    # (caught round 5: on == off == 0.4045 bit-for-bit; the same
    # stale-model trap exists in engine.make_eval_step, see
    # tests/test_vote_rescue.py self-contained pin)
    model = RDMNet(cfg)
    forward = _make_eval_forward(cfg, model, Evaluator(cfg))
    pirs = []
    for i in indices:
        item = dataset[i]
        rp, rc, sp, sc = pad_pair_np(cfg, item["ref_points"], item["src_points"])
        _, metrics = forward(params, rp, rc, sp, sc, item["transform"])
        pirs.append(float(jax.device_get(metrics["PIR"])))
    return float(np.mean(pirs)), pirs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("snapshot_dir")
    ap.add_argument("root", help="mulran-layout stress root (FOV-cropped)")
    ap.add_argument("--bucket_scale", type=float, default=0.7)
    ap.add_argument("--pairs", type=int, default=None,
                    help="evaluate only the first N test pairs")
    ap.add_argument("--margin", type=float, default=2.0,
                    help="required PIR ratio vote-on / vote-off "
                         "(round-3 measured ~19x: 0.58 vs 0.03)")
    ap.add_argument("--out", default=None, help="JSON artifact path")
    args = ap.parse_args()

    from rdmnet_tpu.cli.common import (
        build_model_and_params,
        enable_compile_cache,
    )
    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.data.datasets import RegistrationPairDataset

    enable_compile_cache()
    cfg = make_cfg()
    if args.bucket_scale != 1.0:
        cfg = cfg.replace(pyramid=cfg.pyramid.scaled(args.bucket_scale))
    dataset = RegistrationPairDataset(
        "mulran", root=args.root, subset="test",
        point_limit=cfg.test.point_limit,
    )
    indices = list(range(len(dataset)))[: args.pairs]
    _, params = build_model_and_params(cfg, args.snapshot_dir)

    cfg_on = cfg.replace(vote=dataclasses.replace(cfg.vote, inference_use_vote=True))
    cfg_off = cfg.replace(vote=dataclasses.replace(cfg.vote, inference_use_vote=False))
    pir_on, on_list = mean_pir(cfg_on, params, dataset, indices)
    pir_off, off_list = mean_pir(cfg_off, params, dataset, indices)

    record = {
        "snapshot_dir": osp.abspath(args.snapshot_dir),
        "root": osp.abspath(args.root),
        "pairs": len(indices),
        "pir_vote_on": pir_on,
        "pir_vote_off": pir_off,
        "pir_on_per_pair": on_list,
        "pir_off_per_pair": off_list,
        "margin_required": args.margin,
        "ok": bool(pir_on >= args.margin * pir_off and pir_on > pir_off),
    }
    out = args.out or osp.join(osp.dirname(osp.abspath(args.root)), "vote_rescue.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"vote-on PIR {pir_on:.4f} vs vote-off PIR {pir_off:.4f} "
          f"(need on >= {args.margin}x off) -> "
          f"{'OK' if record['ok'] else 'FAIL'}; artifact: {out}")
    if not record["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
