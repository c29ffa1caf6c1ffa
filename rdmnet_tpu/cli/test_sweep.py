"""Snapshot-sweep evaluation (reference: experiments/test_batchoffline.py:
18-327 — the 'sweep checkpoints' workflow). The reference spawns 4 GPU
processes per epoch (mp.spawn, :255-262); here ``--num_workers N`` launches N
concurrent test processes per epoch, each taking a strided shard of the pair
list and writing into the shared feature dir. On a pod slice, pin one worker
per chip via ``--worker_env`` (e.g. TPU_VISIBLE_DEVICES={shard}); on a single
chip keep num_workers=1 — the pairs are compute-bound, not dispatch-bound.

Usage:
    python -m rdmnet_tpu.cli.test_sweep --dataset kitti --root /data/KITTI \
        --snapshot_dir DIR --epochs 10 20 30 [--methods lgr ransac] \
        [--num_workers 4 --worker_env TPU_VISIBLE_DEVICES={shard}]
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys


def main():
    from rdmnet_tpu.cli.common import enable_compile_cache
    enable_compile_cache()  # minutes-long TPU compiles -> one-time cost
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="kitti")
    parser.add_argument("--root", required=True)
    parser.add_argument("--snapshot_dir", required=True)
    parser.add_argument("--epochs", type=int, nargs="+", required=True)
    parser.add_argument("--methods", nargs="+", default=["lgr", "ransac"])
    parser.add_argument("--feature_root", default="output/sweep")
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument(
        "--worker_env", nargs="*", default=[],
        help="extra KEY=VALUE env per worker; '{shard}' expands to its id",
    )
    parser.add_argument(
        "--worker_args", default="",
        help="extra cli.test flags appended to every worker, one shell-"
             "quoted string (e.g. '--bucket_scale 0.7 --no_compress')",
    )
    parser.add_argument(
        "--eval_args", default="",
        help="extra cli.eval flags appended to every eval run",
    )
    args = parser.parse_args()

    for epoch in args.epochs:
        feature_dir = f"{args.feature_root}/{args.dataset}_epoch{epoch}"
        print(f"=== epoch {epoch}: dump features -> {feature_dir} "
              f"({args.num_workers} worker(s))")
        procs = []
        for shard in range(args.num_workers):
            env = dict(os.environ)
            for kv in args.worker_env:
                k, _, v = kv.partition("=")
                env[k] = v.format(shard=shard)
            procs.append(subprocess.Popen(
                [
                    sys.executable, "-m", "rdmnet_tpu.cli.test",
                    "--dataset", args.dataset, "--root", args.root,
                    "--snapshot_dir", args.snapshot_dir,
                    "--test_epoch", str(epoch),
                    "--feature_dir", feature_dir,
                    "--num_shards", str(args.num_workers),
                    "--shard_id", str(shard),
                ] + shlex.split(args.worker_args),
                env=env,
            ))
        # wait for ALL workers before judging: raising on the first failure
        # would orphan the survivors mid-write into the shared feature_dir
        rcs = [p.wait() for p in procs]
        failed = [(shard, rc) for shard, rc in enumerate(rcs) if rc != 0]
        if failed:
            # a dead worker leaves its pair shard missing: evaluating
            # the incomplete dump would silently corrupt the metrics
            raise RuntimeError(f"test worker(s) failed (shard, rc): {failed}")
        for method in args.methods:
            print(f"=== epoch {epoch}: eval method={method}")
            subprocess.run(
                [
                    sys.executable, "-m", "rdmnet_tpu.cli.eval",
                    "--feature_dir", feature_dir, "--method", method,
                ] + shlex.split(args.eval_args),
                check=True,
            )


if __name__ == "__main__":
    main()
