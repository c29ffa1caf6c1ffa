"""Assert accuracy bands over a cli.eval --json_out summary (VERDICT r4 #8).

The held-out recipes asserted only RR == 100% outcomes, so any accuracy
drift smaller than "a pair drops below the acceptance thresholds"
(RRE 5 deg / RTE 2 m, reference experiments/config.py:66-67) was invisible.
This check adds error-BAND assertions on top of the recall floor: the
default RRE/RTE bands (0.25 deg / 7 cm) sit ~3x above the measured
run-to-run spread of the proven curriculum (STATUS round-4: RRE spread
across identical-recipe retrains ~0.02 deg around ~0.18 deg; RTE ~5 cm),
so a regression well below the RR cliff still fails the recipe loudly.

Wired into the held-out eval recipes (run_procedural_generalization.sh,
run_scaling_12scene.sh, run_fresh_scene_eval.sh, run_enriched_curriculum.sh).

Usage: python scripts/check_eval_bands.py SUMMARY_JSON \
          [--rr_min 1.0] [--rre_max 0.25] [--rte_max 0.07]
Exit 0 iff every band holds.
"""

import argparse
import json
import math
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("summary", help="cli.eval --json_out file")
    ap.add_argument("--rr_min", type=float, default=1.0,
                    help="minimum registration recall (fraction)")
    ap.add_argument("--rre_max", type=float, default=0.25,
                    help="max mean RRE over accepted pairs (deg)")
    ap.add_argument("--rte_max", type=float, default=0.07,
                    help="max mean RTE over accepted pairs (m)")
    ap.add_argument("--pir_min", type=float, default=None,
                    help="optional minimum mean coarse precision")
    args = ap.parse_args()

    with open(args.summary) as f:
        s = json.load(f)

    checks = [("RR", s["RR"], ">=", args.rr_min)]
    # RRE/RTE are None when no pair was accepted — always out of band then
    checks.append(("RRE_deg", s["RRE_deg"], "<=", args.rre_max))
    checks.append(("RTE_m", s["RTE_m"], "<=", args.rte_max))
    if args.pir_min is not None:
        checks.append(("PIR", s["PIR"], ">=", args.pir_min))

    failures = []
    for name, val, op, bound in checks:
        if op == "<=" and math.isinf(bound):
            continue  # band disabled (pass 'inf' to skip)
        ok = (val is not None
              and (val >= bound if op == ">=" else val <= bound))
        mark = "ok" if ok else "FAIL"
        print(f"band {name}: {val if val is not None else 'n/a'} {op} {bound}"
              f" -> {mark}")
        if not ok:
            failures.append(name)
    if s.get("failed_pairs"):
        print("failed pairs:", s["failed_pairs"])
    if failures:
        print(f"check_eval_bands: {len(failures)} band(s) violated: "
              f"{failures} ({args.summary})")
        sys.exit(1)
    print(f"check_eval_bands: all bands hold over {s['n_pairs']} pairs")


if __name__ == "__main__":
    main()
