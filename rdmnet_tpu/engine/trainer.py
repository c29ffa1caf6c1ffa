"""Epoch-based trainer (reference: geotransformer/engine/
epoch_based_trainer.py:16-198 + base_trainer.py:32-259).

Orchestrates: device batching, jitted DP train step, validation, rolling
orbax snapshots, resume, metric logging. The reference's NCCL/DDP and
host-device shuffling disappear: the mesh + sharded batches handle
parallelism, and the pyramid builds on device inside the step.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.config import Config
from rdmnet_tpu.data.loader import PairLoader
from rdmnet_tpu.engine.checkpoint import CheckpointManager
from rdmnet_tpu.engine.logger import create_logger
from rdmnet_tpu.engine.meters import SummaryBoard, Timer
from rdmnet_tpu.engine.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from rdmnet_tpu.graph.pyramid import build_pair_batch
from rdmnet_tpu.parallel import make_mesh, replicate_to_mesh, shard_batch


import functools


@functools.lru_cache(maxsize=8)
def _jitted_builder(spec):
    """One compiled vmapped pyramid builder per (hashable) PyramidConfig —
    rebuilding jax.jit(vmap(...)) per call would miss the jit cache every
    time and retrace every training step (measured: 1 retrace per call)."""
    return jax.jit(
        jax.vmap(
            lambda rp, rc, sp, sc, tf, rd, sd: build_pair_batch(
                rp, rc, sp, sc, tf, spec, ref_dropped0=rd, src_dropped0=sd
            )
        )
    )


def batch_to_device(np_batch, spec, mesh=None):
    """Host numpy batch -> batched PairBatch (pyramid built on device, vmapped).

    With a mesh, the RAW host batch is sharded over 'dp' BEFORE the jitted
    build, so XLA partitions the pyramid construction and each device
    builds only its own shard — instead of building all B pyramids on the
    default device and scattering the result. This ordering is also the
    only correct one under multi-host (each process holds its local loader
    shard; see shard_batch).
    """
    bsz = len(np_batch["ref_points"])
    args = (
        np.asarray(np_batch["ref_points"]),
        np.asarray(np_batch["ref_counts"]),
        np.asarray(np_batch["src_points"]),
        np.asarray(np_batch["src_counts"]),
        np.asarray(np_batch["transform"]),
        np.asarray(np_batch.get("ref_dropped", np.zeros(bsz, np.int32))),
        np.asarray(np_batch.get("src_dropped", np.zeros(bsz, np.int32))),
    )
    if mesh is not None:
        args = shard_batch(args, mesh)
    return _jitted_builder(spec)(*args)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        train_loader: PairLoader,
        val_loader: Optional[PairLoader] = None,
        output_dir: str = "output",
        log_steps: int = 10,
        keep_snapshots: Optional[int] = None,
    ):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.output_dir = output_dir
        self.log_steps = log_steps
        self.logger = create_logger(os.path.join(output_dir, "logs", "train.log"))
        self.snapshots = CheckpointManager(
            os.path.join(output_dir, "snapshots"), max_to_keep=keep_snapshots
        )
        # best-by-validation snapshot (snapshots_best/, max_to_keep=1).
        # The reference finds its best epoch by sweeping every per-epoch
        # .pth.tar through test_batchoffline.py; tracking the best val
        # registration score during training gives the same artifact for
        # the cost of the validation pass we already run. Selection order:
        # higher RR, then lower RRE, then lower RTE (the same ordering the
        # published results table uses). `rdmnet-test --snapshot_dir
        # <run>/snapshots_best` evaluates it.
        self.best_snapshots = CheckpointManager(
            os.path.join(output_dir, "snapshots_best"), max_to_keep=1
        )
        self._best_score = None

        # persist the exact run config for reproducibility (the reference
        # has no equivalent — its config is a global built at import time;
        # here every CLI override lands in the frozen cfg tree, so one dump
        # reconstructs the run)
        if jax.process_index() == 0:
            import dataclasses
            import json

            with open(os.path.join(output_dir, "config.json"), "w") as f:
                json.dump(dataclasses.asdict(cfg), f, indent=1, default=str)

        # explicit opt-in: dp=-1 (all devices) or dp>1 builds the mesh;
        # the old device_count>1 check silently built a 1-device mesh and
        # left the other chips idle
        dp_cfg = cfg.parallel.dp
        self.mesh = make_mesh(dp_cfg) if (dp_cfg == -1 or dp_cfg > 1) else None
        dp = self.mesh.devices.size if self.mesh is not None else 1
        if self.mesh is None and jax.device_count() > 1:
            self.logger.info(
                f"{jax.device_count()} devices visible but parallel.dp=1 — "
                "training single-device; set dp=-1 (all) or dp=N for data "
                "parallelism"
            )

        # init from one example batch — peek() loads it synchronously;
        # next(iter(loader)) would abandon a prefetching iterator and leak
        # its blocked worker thread + queued batches
        example = train_loader.peek()
        device_batch = batch_to_device(example, cfg.pyramid)
        single = jax.tree.map(lambda x: x[0], device_batch)
        self.state = create_train_state(
            cfg, jax.random.PRNGKey(cfg.seed), single,
            steps_per_epoch=max(len(train_loader), 1), dp_size=dp,
        )
        if self.mesh is not None:
            self.state = replicate_to_mesh(self.state, self.mesh)
        self.train_step = make_train_step(cfg)
        self.eval_step = make_eval_step(cfg)
        self.epoch = 0
        self.key = jax.random.PRNGKey(cfg.seed + 1)

    def resume(self):
        step = self.snapshots.latest_step()
        if step is None:
            self.logger.info("no snapshot found; training from scratch")
            return
        self.state, meta = self.snapshots.restore(self.state, step)
        self.epoch = int(meta.get("epoch", step))
        try:
            best_meta = self.best_snapshots.read_metadata()
            self._best_score = tuple(best_meta["score"])
        except (FileNotFoundError, KeyError):
            pass
        self.logger.info(f"resumed from snapshot step={step} epoch={self.epoch}")

    def warm_start(self, snapshot_dir: str, step: Optional[int] = None):
        """Load PARAMS ONLY from another run's snapshot (curriculum phases /
        fine-tuning): fresh optimizer state, epoch counter, and LR schedule,
        regardless of the source run's optimizer structure."""
        params = CheckpointManager(snapshot_dir).restore_params(step)
        self.state = self.state.replace(params=params)
        if self.mesh is not None:
            self.state = replicate_to_mesh(self.state, self.mesh)
        self.logger.info(f"warm-started params from {snapshot_dir}")

    def train_epoch(self):
        board = SummaryBoard(last_n=self.log_steps)
        timer = Timer()
        timer.tic()
        pending = []  # device-side metric trees awaiting one batched fetch
        steps = 0

        def flush():
            # ONE batched fetch for the whole window: fetching every step
            # forces a full sync + tunnel round trip per step, which breaks
            # dispatch pipelining (measured 0.42 s/step real-Trainer vs
            # 0.25 s/step for the same program chained in bench.py); the
            # deferred fetch is also the window's completion barrier
            # (block_until_ready does not synchronize on this link).
            for m in jax.device_get(pending):
                board.update_from_dict(m)
            pending.clear()

        t_win = time.time()
        for i, np_batch in enumerate(self.train_loader):
            batch = batch_to_device(np_batch, self.cfg.pyramid, self.mesh)
            timer.record_prepare()
            self.key, sub = jax.random.split(self.key)
            self.state, metrics = self.train_step(self.state, batch, sub)
            pending.append(metrics)
            timer.record_process()
            steps = i + 1
            if steps % self.log_steps == 0:
                flush()
                # prep/proc are now DISPATCH-side costs (the step executes
                # asynchronously); the windowed rate below is the honest
                # sustained number — flush() is its completion barrier
                rate = self.log_steps / max(time.time() - t_win, 1e-9)
                t_win = time.time()
                self.logger.info(
                    f"epoch {self.epoch} step {steps}/{len(self.train_loader)} "
                    f"| {board.format()} | prep {timer.prepare_time():.3f}s "
                    f"proc {timer.process_time():.3f}s "
                    f"| {rate:.2f} steps/s"
                )
        flush()
        return board.summary()

    def validate(self):
        if self.val_loader is None:
            return {}
        # weight each batch's (valid-pair) mean by its valid-pair count so
        # the ragged tail batch doesn't over-weight its pairs — the
        # reference's SummaryBoard accumulates per pair
        sums: dict = {}
        denom = 0.0
        for np_batch in self.val_loader:
            batch = batch_to_device(np_batch, self.cfg.pyramid, self.mesh)
            valid = np_batch.get("batch_valid")
            metrics, _ = self.eval_step(
                self.state, batch,
                None if valid is None else jnp.asarray(valid),
            )
            n_valid = (
                float(np.sum(valid)) if valid is not None
                else float(len(np_batch["ref_points"]))
            )
            for k, v in jax.device_get(metrics).items():  # one batched fetch
                try:
                    sums[k] = sums.get(k, 0.0) + float(v) * n_valid
                except (TypeError, ValueError):
                    pass
            denom += n_valid
        summary = {k: v / max(denom, 1.0) for k, v in sums.items()}
        line = ", ".join(f"{k}: {v:.4f}" for k, v in sorted(summary.items()))
        self.logger.info(f"val epoch {self.epoch} | {line}")
        return summary

    @staticmethod
    def _val_score(summary: dict):
        """Ordering for best-snapshot selection: maximize RR, break ties on
        lower RRE then lower RTE (the published-results ordering)."""
        if "RR" not in summary:
            return None
        return (
            float(summary["RR"]),
            -float(summary.get("RRE", np.inf)),
            -float(summary.get("RTE", np.inf)),
        )

    def _maybe_save_best(self, val_summary: dict):
        score = self._val_score(val_summary)
        if score is None:
            return
        if self._best_score is not None and tuple(score) <= tuple(self._best_score):
            return
        self._best_score = score
        self.best_snapshots.save(
            self.epoch,
            jax.device_get(self.state),
            metadata={"epoch": self.epoch, "score": list(score),
                      **{k: float(v) for k, v in val_summary.items()
                         if isinstance(v, (int, float))}},
        )
        self.logger.info(
            f"new best val snapshot at epoch {self.epoch} "
            f"(RR {score[0]:.4f}, RRE {-score[1]:.4f}, RTE {-score[2]:.4f})"
        )

    def _write_metrics(self, phase: str, summary: dict):
        """Append a metrics record to metrics.jsonl (stands in for the
        reference's TensorBoard scalars, base_trainer.py:250-255)."""
        import json

        path = os.path.join(self.output_dir, "metrics.jsonl")
        os.makedirs(self.output_dir, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps({"phase": phase, "epoch": self.epoch, **summary}) + "\n")

    def run(self, resume: bool = False):
        if resume:
            self.resume()
        while self.epoch < self.cfg.optim.max_epoch:
            t0 = time.time()
            train_summary = self.train_epoch()
            self._write_metrics("train", train_summary)
            val_summary = self.validate()
            if val_summary:
                self._write_metrics("val", val_summary)
            self.epoch += 1
            self.snapshots.save(
                self.epoch,
                jax.device_get(self.state),
                metadata={"epoch": self.epoch,
                          "loss": float(train_summary.get("loss", np.nan))},
            )
            if val_summary:
                self._maybe_save_best(val_summary)
            self.logger.info(
                f"epoch {self.epoch} done in {time.time() - t0:.1f}s; snapshot saved"
            )
        # async snapshot writes must land before the process exits
        self.snapshots.wait_until_finished()
        self.best_snapshots.wait_until_finished()
