"""Training-curve figures from a run's metrics.jsonl.

The reference logs train/val scalars to TensorBoard
(geotransformer/engine/base_trainer.py:59-61,250-255); this framework's
trainer appends one JSON record per phase per epoch to
``<output_dir>/metrics.jsonl`` instead. This script renders those records
to PNGs (headless matplotlib): one panel per train loss term, one per val
metric.

Usage: python scripts/plot_training.py --run /tmp/synth_train_out \
           [--out /tmp/synth_train_out/figures]
"""

import argparse
import json
import os
import os.path as osp
from collections import defaultdict


def load_metrics(path):
    """{phase: {key: (epochs, values)}} from a metrics.jsonl file."""
    series = defaultdict(lambda: defaultdict(lambda: ([], [])))
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            phase, epoch = rec.pop("phase"), rec.pop("epoch")
            for key, value in rec.items():
                if isinstance(value, (int, float)):
                    xs, ys = series[phase][key]
                    xs.append(epoch)
                    ys.append(float(value))
    return series


def plot_phase(series, phase, out_path, logy_keys=()):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = sorted(series[phase])
    if not keys:
        return False
    ncols = min(4, len(keys))
    nrows = (len(keys) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows),
                             squeeze=False)
    for i, key in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        xs, ys = series[phase][key]
        ax.plot(xs, ys, lw=1.2)
        ax.set_title(key, fontsize=10)
        ax.set_xlabel("epoch", fontsize=8)
        ax.grid(alpha=0.3)
        if key in logy_keys and min(ys) > 0:
            ax.set_yscale("log")
    for j in range(len(keys), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.suptitle(f"{phase} metrics")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="trainer output_dir containing metrics.jsonl")
    ap.add_argument("--out", default=None, help="figure dir (default <run>/figures)")
    args = ap.parse_args()

    out_dir = args.out or osp.join(args.run, "figures")
    os.makedirs(out_dir, exist_ok=True)
    series = load_metrics(osp.join(args.run, "metrics.jsonl"))
    written = []
    for phase in series:
        path = osp.join(out_dir, f"{phase}_curves.png")
        if plot_phase(series, phase, path, logy_keys={"loss", "grad_norm"}):
            written.append(path)
    print("wrote: " + ", ".join(written))


if __name__ == "__main__":
    main()
