"""Iteration-budget trainer (reference: geotransformer/engine/
iter_based_trainer.py — the CycleLoader + max-iteration variant, unused by
the RDMNet CLIs but part of the engine surface)."""

from __future__ import annotations

import jax
import numpy as np

from rdmnet_tpu.config import Config
from rdmnet_tpu.data.loader import PairLoader
from rdmnet_tpu.engine.trainer import Trainer, batch_to_device


class CycleLoader:
    """Endlessly cycle a PairLoader (reference iter_based_trainer.py
    CycleLoader) with deterministic, resumable shuffling: each pass
    reseeds the loader with ``seed + pass_index``, and
    ``start_iteration`` fast-forwards (index-level, no item loads) to
    the exact batch a preempted run stopped at — instead of replaying
    the same shuffled prefix after every restart."""

    def __init__(self, loader: PairLoader, start_iteration: int = 0):
        self.loader = loader
        n = max(1, len(loader))
        self.pass_index = start_iteration // n
        self.skip = start_iteration % n

    def __iter__(self):
        while True:
            # array seed (init_by_array): adjacent scalar seeds produce
            # CORRELATED MT19937 streams (seed+0 and seed+1 yield the same
            # small-N permutation) — the pair decorrelates each pass
            self.loader.rng = np.random.RandomState(
                [self.loader.seed, self.pass_index]
            )
            yield from self.loader.iter_from(self.skip)
            self.skip = 0
            self.pass_index += 1


class IterBasedTrainer(Trainer):
    """Train for a fixed number of iterations instead of epochs."""

    def __init__(self, *args, max_iterations: int = 100000,
                 snapshot_every: int = 1000, val_every: int = 1000, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_iterations = max_iterations
        self.snapshot_every = snapshot_every
        self.val_every = val_every
        self.iteration = 0

    def run(self, resume: bool = False):
        if resume:
            step = self.snapshots.latest_step()
            if step is not None:
                self.state, meta = self.snapshots.restore(self.state, step)
                self.iteration = int(meta.get("iteration", step))
                # advance the dropout/target-sampling stream past the
                # completed iterations instead of replaying it from seed
                self.key = jax.random.fold_in(self.key, self.iteration)
                self.logger.info(f"resumed at iteration {self.iteration}")

        stream = iter(CycleLoader(self.train_loader, start_iteration=self.iteration))
        while self.iteration < self.max_iterations:
            np_batch = next(stream)
            batch = batch_to_device(np_batch, self.cfg.pyramid, self.mesh)
            self.key, sub = jax.random.split(self.key)
            self.state, metrics = self.train_step(self.state, batch, sub)
            self.iteration += 1
            if self.iteration % self.log_steps == 0:
                # one batched fetch (doubles as the step barrier; per-key
                # float() would round-trip per metric on remote links)
                metrics = jax.device_get(metrics)
                self.logger.info(
                    f"iter {self.iteration}/{self.max_iterations} | "
                    + ", ".join(f"{k}: {float(v):.4f}" for k, v in metrics.items())
                )
            if self.iteration % self.val_every == 0:
                self.validate()
            if self.iteration % self.snapshot_every == 0:
                self.snapshots.save(
                    self.iteration, jax.device_get(self.state),
                    metadata={"iteration": self.iteration},
                )
        # async snapshot writes must land before the process exits
        self.snapshots.wait_until_finished()
