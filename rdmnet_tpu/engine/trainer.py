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
    """Host numpy batch -> batched PairBatch (pyramid built on device, vmapped)."""
    bsz = len(np_batch["ref_points"])
    args = (
        jnp.asarray(np_batch["ref_points"]),
        jnp.asarray(np_batch["ref_counts"]),
        jnp.asarray(np_batch["src_points"]),
        jnp.asarray(np_batch["src_counts"]),
        jnp.asarray(np_batch["transform"]),
        jnp.asarray(np_batch.get("ref_dropped", np.zeros(bsz, np.int32))),
        jnp.asarray(np_batch.get("src_dropped", np.zeros(bsz, np.int32))),
    )
    batch = _jitted_builder(spec)(*args)
    if mesh is not None:
        batch = shard_batch(batch, mesh)
    return batch


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

        self.mesh = make_mesh(cfg.parallel.dp) if jax.device_count() > 1 else None
        dp = self.mesh.devices.size if self.mesh is not None else 1

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
        self.logger.info(f"resumed from snapshot step={step} epoch={self.epoch}")

    def train_epoch(self):
        board = SummaryBoard(last_n=self.log_steps)
        timer = Timer()
        timer.tic()
        for i, np_batch in enumerate(self.train_loader):
            batch = batch_to_device(np_batch, self.cfg.pyramid, self.mesh)
            timer.record_prepare()
            self.key, sub = jax.random.split(self.key)
            self.state, metrics = self.train_step(self.state, batch, sub)
            jax.block_until_ready(metrics["loss"])
            timer.record_process()
            board.update_from_dict(metrics)
            if (i + 1) % self.log_steps == 0:
                self.logger.info(
                    f"epoch {self.epoch} step {i + 1}/{len(self.train_loader)} "
                    f"| {board.format()} | prep {timer.prepare_time():.3f}s "
                    f"proc {timer.process_time():.3f}s"
                )
        return board.summary()

    def validate(self):
        if self.val_loader is None:
            return {}
        board = SummaryBoard()
        for np_batch in self.val_loader:
            batch = batch_to_device(np_batch, self.cfg.pyramid, self.mesh)
            valid = np_batch.get("batch_valid")
            metrics, _ = self.eval_step(
                self.state, batch,
                None if valid is None else jnp.asarray(valid),
            )
            board.update_from_dict(metrics)
        summary = board.summary()
        self.logger.info(f"val epoch {self.epoch} | {board.format()}")
        return summary

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
            self.logger.info(
                f"epoch {self.epoch} done in {time.time() - t0:.1f}s; snapshot saved"
            )
