"""Failure-mode breakdown of a hard-tier sweep (VERDICT r4 #1).

Reads the per-rung/arm cli.eval --json_out summaries written by
scripts/run_hard_tier_eval.sh and prints, per rung and vote arm, the
accepted/failed split with PIR / IR / overlap / RRE / RTE distributions on
each side — the evidence that failures are the intended hard regime
(low-overlap, clutter-collapsed coarse matching) rather than pipeline
faults. A pair counts accepted under the reference's thresholds
(RRE < 5 deg, RTE < 2 m, /root/reference/experiments/config.py:66-67),
matching cli.eval's own accounting.

Usage: python scripts/hard_tier_breakdown.py [WORKDIR]
"""

import glob
import json
import os.path as osp
import sys

import numpy as np

RRE_THR, RTE_THR = 5.0, 2.0


def stats(pairs, key):
    if not pairs:
        return "n/a"
    v = np.array([p[key] for p in pairs])
    return f"{np.median(v):.3f} [{v.min():.3f}..{v.max():.3f}]"


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rdmnet_hard_tier"
    for path in sorted(glob.glob(osp.join(work, "features_*", "summary.json"))):
        arm = osp.basename(osp.dirname(path)).replace("features_", "")
        with open(path) as f:
            s = json.load(f)
        if "pir" not in (s["per_pair"][0] if s["per_pair"] else {}):
            print(f"[{arm}] summary lacks per-pair PIR — re-run cli.eval "
                  f"--json_out over {osp.dirname(path)}")
            continue
        acc = [p for p in s["per_pair"]
               if p["rre"] < RRE_THR and p["rte"] < RTE_THR]
        fail = [p for p in s["per_pair"]
                if not (p["rre"] < RRE_THR and p["rte"] < RTE_THR)]
        print(f"[{arm}] RR {s['RR'] * 100:.1f}% "
              f"({len(acc)} accepted / {len(fail)} failed)")
        for name, grp in (("accepted", acc), ("failed  ", fail)):
            print(f"  {name}: PIR {stats(grp, 'pir')}  "
                  f"IR {stats(grp, 'ir')}  overlap {stats(grp, 'overlap')}  "
                  f"RRE {stats(grp, 'rre')}  RTE {stats(grp, 'rte')}")


if __name__ == "__main__":
    main()
