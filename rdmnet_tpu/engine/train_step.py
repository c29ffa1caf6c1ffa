"""Train/eval step factories: optax optimizer, vmapped loss, DP sharding.

Replaces the reference's torch engine internals
(reference: geotransformer/engine/base_trainer.py:181-238,
epoch_based_trainer.py:82-144):

* Adam + staircase-exponential LR + L2 weight decay
  (reference trainval.py:34-37, config.py:76-82);
* NaN/Inf gradient guard -> the update is skipped, not ipdb'd
  (reference base_trainer.py:223-231);
* gradient accumulation via optax.MultiSteps (reference base_trainer.py:212-215);
* data parallelism: batches carry a leading device axis sharded over the
  'dp' mesh axis; gradients all-reduce automatically under jit sharding
  (replaces NCCL DDP, reference base_trainer.py:63-78).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from rdmnet_tpu.config import Config
from rdmnet_tpu.graph.pyramid import PairBatch
from rdmnet_tpu.losses import Evaluator, OverallLoss
from rdmnet_tpu.models import RDMNet


class TrainState(train_state.TrainState):
    pass


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    eta_init: float = 0.1,
    eta_min: float = 0.1,
) -> Callable:
    """Warmup-cosine LR factor schedule, reference semantics
    (geotransformer/utils/torch.py:152-171 WarmUpCosineAnnealingFunction):
    the factor ramps linearly eta_init -> 1 over ``warmup_steps``, then
    follows a half cosine 1 -> eta_min over the remaining steps, clamping
    at eta_min past ``total_steps``.  ``count`` is the applied-update
    counter (0 for the first update); torch's LambdaLR evaluates the
    factor at ``next_step = last_epoch + 1`` and its constructor step()
    leaves last_epoch = count, so update ``count`` uses the factor at
    ``step = count + 1`` (verified against a live LambdaLR sequence in
    tests/test_engine.py).
    """
    warmup = max(0, warmup_steps)
    normal = max(1, total_steps - warmup)

    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0
        warm = eta_init + (1.0 - eta_init) * step / jnp.maximum(warmup, 1)
        t = step - warmup
        cos = eta_min + 0.5 * (1.0 - eta_min) * (1.0 + jnp.cos(jnp.pi * t / normal))
        factor = jnp.where(
            step < warmup, warm, jnp.where(step > total_steps, eta_min, cos)
        )
        return base_lr * factor

    return schedule


def create_optimizer(cfg: Config, steps_per_epoch: int, dp_size: int = 1):
    """Adam(lr·dp, wd) with x0.95 staircase decay every lr_decay_steps epochs.

    The reference scales lr by world size under DDP
    (base_trainer.py:193-198); we mirror that with ``dp_size`` when
    cfg.parallel.scale_lr_by_dp.
    """
    lr = cfg.optim.lr * (dp_size if cfg.parallel.scale_lr_by_dp else 1)
    # the schedule count advances once per APPLIED update: under MultiSteps
    # the inner Adam (and its schedule) runs once per grad_acc_steps
    # micro-batches, so transition_steps must be in macro steps to keep the
    # reference's "decay every lr_decay_steps EPOCHS" semantics
    # (reference trainval.py:36, epoch_based_trainer.py:137)
    applied_per_epoch = max(1, steps_per_epoch // max(1, cfg.optim.grad_acc_steps))
    if cfg.optim.scheduler == "step":
        schedule = optax.exponential_decay(
            init_value=lr,
            transition_steps=cfg.optim.lr_decay_steps * applied_per_epoch,
            decay_rate=cfg.optim.lr_decay,
            staircase=True,
        )
    elif cfg.optim.scheduler == "warmup_cosine":
        schedule = warmup_cosine_schedule(
            lr,
            total_steps=cfg.optim.max_epoch * applied_per_epoch,
            warmup_steps=cfg.optim.warmup_steps // max(1, cfg.optim.grad_acc_steps),
            eta_init=cfg.optim.eta_init,
            eta_min=cfg.optim.eta_min,
        )
    else:
        raise ValueError(
            f"unknown optim.scheduler {cfg.optim.scheduler!r} "
            "(expected 'step' or 'warmup_cosine')"
        )
    # kernel_points are geometry constants (stop-gradient params so that
    # converted reference checkpoints restore them) — never decay them
    def _decay_mask(params):
        import jax

        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(k, "key", None) == "kernel_points" for k in path
            ),
            params,
        )

    tx = optax.chain(
        optax.add_decayed_weights(cfg.optim.weight_decay, mask=_decay_mask),
        optax.adam(schedule),
    )
    # skip updates with non-finite grads instead of crashing
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if cfg.optim.grad_acc_steps > 1:
        tx = optax.MultiSteps(tx, cfg.optim.grad_acc_steps)
    return tx, schedule


def create_train_state(
    cfg: Config, rng: jax.Array, example_batch: PairBatch,
    steps_per_epoch: int = 1000, dp_size: int = 1,
) -> TrainState:
    model = RDMNet(cfg)
    # jit the init: eager execution pays per-op dispatch latency on remote
    # devices (measured ~600s vs seconds for the full model)
    params = jax.jit(
        lambda r, b: model.init(r, b, training=True, with_gt=True, target_key=r)
    )(rng, example_batch)
    tx, _ = create_optimizer(cfg, steps_per_epoch, dp_size)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_batch_loss(cfg: Config) -> Callable:
    """``batch_loss(params, apply_fn, batch, key) -> (loss, metrics)`` over a
    batched PairBatch (mean of the per-pair losses, DDP semantics)."""
    loss_module = OverallLoss(cfg)
    evaluator = Evaluator(cfg)

    def single_pair_loss(params, apply_fn, batch, key):
        out = apply_fn(params, batch, training=True, with_gt=True, target_key=key)
        losses = loss_module(out, batch)
        losses["PIR"] = evaluator(out, batch, evaling=False)["PIR"]
        return losses

    def batch_loss(params, apply_fn, batch, key):
        bsz = batch.transform.shape[0]
        if bsz == 1:
            # unbatched fast path: XLA:TPU's windowed top-k emitter aborts on
            # vmapped (1, N) operands, and unvmapped gathers are faster anyway
            single = jax.tree.map(lambda x: x[0], batch)
            losses = single_pair_loss(params, apply_fn, single, key)
            return losses["loss"], losses
        keys = jax.random.split(key, bsz)
        losses = jax.vmap(
            functools.partial(single_pair_loss, params, apply_fn)
        )(batch, keys)
        mean_losses = jax.tree.map(jnp.mean, losses)
        return mean_losses["loss"], mean_losses

    return batch_loss


def make_value_and_grad(cfg: Config) -> Callable:
    """jit'd ``(state, batch, key) -> (metrics, grads)`` without the
    optimizer update — used by the dp-parity tests to compare raw gradients
    between sharded and unsharded execution."""
    batch_loss = make_batch_loss(cfg)

    @jax.jit
    def value_and_grad(state: TrainState, batch: PairBatch, key: jax.Array):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: batch_loss(p, state.apply_fn, batch, key), has_aux=True
        )(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        return metrics, grads

    return value_and_grad


def make_train_step(cfg: Config) -> Callable:
    """Returns jit'd ``step(state, batch, key) -> (state, metrics)``.

    ``batch`` is a PairBatch pytree with a leading batch axis (B, ...).
    Shard the leading axis over the 'dp' mesh axis for data parallelism.
    """
    batch_loss = make_batch_loss(cfg)

    @jax.jit
    def step(state: TrainState, batch: PairBatch, key: jax.Array):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: batch_loss(p, state.apply_fn, batch, key), has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_eval_step(cfg: Config, with_transform: bool = True) -> Callable:
    """Returns jit'd ``eval_step(state, batch) -> metrics`` over a batched
    PairBatch (full registration pipeline incl. LGR)."""
    evaluator = Evaluator(cfg)

    def single(params, apply_fn, batch):
        # pallas-off under vmap: vmapped pallas_call has shown pathological
        # XLA compile times on this backend
        out = apply_fn(params, batch, training=False, with_gt=True,
                       use_pallas_sinkhorn=False)
        metrics = evaluator(out, batch, evaling=with_transform)
        # capacity-overflow telemetry: points/voxels silently dropped by any
        # pyramid level (should be 0 with correctly sized bucket caps)
        metrics["dropped"] = (
            jnp.sum(batch.ref.dropped) + jnp.sum(batch.src.dropped)
        ).astype(jnp.float32)
        return metrics, out["estimated_transform"]

    @jax.jit
    def eval_step(state: TrainState, batch: PairBatch, valid=None):
        """``valid``: optional (B,) bool excluding ragged-tail repeats (the
        loader duplicates the last pair to fill a fixed batch; unweighted
        means would double-count it)."""
        bsz = batch.transform.shape[0]
        if bsz == 1:
            # unbatched fast path — XLA:TPU's windowed top-k emitter aborts
            # on vmapped (1, N) operands (same workaround as batch_loss)
            metrics, tf = single(
                state.params, state.apply_fn, jax.tree.map(lambda x: x[0], batch)
            )
            return metrics, tf[None]
        metrics, transforms = jax.vmap(
            functools.partial(single, state.params, state.apply_fn)
        )(batch)
        if valid is None:
            return jax.tree.map(jnp.mean, metrics), transforms
        w = valid.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w), 1.0)
        return (
            jax.tree.map(lambda m: jnp.sum(m * w) / denom, metrics),
            transforms,
        )

    return eval_step
