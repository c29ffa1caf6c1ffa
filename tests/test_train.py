"""Training-step tests: losses finite, gradients flow, tiny overfit improves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.config import make_tiny_cfg
from rdmnet_tpu.engine import create_train_state, make_eval_step, make_train_step
from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud
from rdmnet_tpu.ops.geometry import apply_transform
from tests.test_ops_core import random_transform

# full-model compiles: minutes on CPU -> excluded from the default fast run
pytestmark = pytest.mark.slow


def make_batch(cfg, rng, bsz=1, n=400):
    def one(seed):
        r = np.random.RandomState(seed)
        tf = random_transform(r, max_angle=0.3, max_trans=1.0)
        src = (r.rand(n, 3) * 20).astype(np.float32)
        ref = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(tf)))
        rp, rc = pad_cloud(jnp.asarray(ref), cfg.pyramid.caps[0])
        sp, sc = pad_cloud(jnp.asarray(src), cfg.pyramid.caps[0])
        return build_pair_batch(rp, rc, sp, sc, jnp.asarray(tf), cfg.pyramid)

    batches = [one(s) for s in range(bsz)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


@pytest.fixture(scope="module")
def trainer_setup():
    cfg = make_tiny_cfg()
    batch = make_batch(cfg, None, bsz=1)
    single = jax.tree.map(lambda x: x[0], batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), single, steps_per_epoch=10)
    return cfg, state, batch


class TestTrainStep:
    def test_losses_finite_and_positive(self, trainer_setup):
        cfg, state, batch = trainer_setup
        step = make_train_step(cfg)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} = {v}"
        assert float(metrics["loss"]) > 0
        assert float(metrics["grad_norm"]) > 0

    def test_params_update(self, trainer_setup):
        cfg, state, batch = trainer_setup
        step = make_train_step(cfg)
        new_state, _ = step(state, batch, jax.random.PRNGKey(1))
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
        )
        assert max(jax.tree.leaves(diffs)) > 0

    def test_loss_decreases_overfit(self, trainer_setup):
        cfg, state, batch = trainer_setup
        step = make_train_step(cfg)
        key = jax.random.PRNGKey(2)
        first = None
        for i in range(12):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert last < first, f"loss did not decrease: {first} -> {last}"

    def test_eval_step(self, trainer_setup):
        cfg, state, batch = trainer_setup
        eval_step = make_eval_step(cfg)
        metrics, transforms = eval_step(state, batch)
        assert transforms.shape == (1, 4, 4)
        for k in ["PIR", "IR", "RRE", "RTE", "RR"]:
            assert np.isfinite(float(metrics[k])), k
