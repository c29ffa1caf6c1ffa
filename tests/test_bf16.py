"""bf16 compute-path tests: finiteness and agreement with f32."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.config import make_tiny_cfg
from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud
from rdmnet_tpu.models import RDMNet
from rdmnet_tpu.ops.geometry import apply_transform
from tests.test_ops_core import random_transform

# full-model compiles: minutes on CPU -> excluded from the default fast run
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pair():
    cfg32 = make_tiny_cfg()
    rng = np.random.RandomState(3)
    tf = random_transform(rng, max_angle=0.3, max_trans=1.0)
    src = (rng.rand(400, 3) * 20).astype(np.float32)
    ref = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(tf)))
    rp, rc = pad_cloud(jnp.asarray(ref), 512)
    sp, sc = pad_cloud(jnp.asarray(src), 512)
    batch = build_pair_batch(rp, rc, sp, sc, jnp.asarray(tf), cfg32.pyramid)
    return cfg32, batch, tf


class TestBF16Path:
    def test_bf16_forward_finite_and_close_to_f32(self, pair):
        cfg32, batch, tf = pair
        cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
        model32 = RDMNet(cfg32)
        model16 = RDMNet(cfg16)
        params = model32.init(jax.random.PRNGKey(0), batch, training=False, with_gt=False)
        out32 = model32.apply(params, batch, training=False, with_gt=False)
        out16 = model16.apply(params, batch, training=False, with_gt=False)
        est16 = np.asarray(out16["estimated_transform"])
        assert np.isfinite(est16).all()
        # bf16 and f32 paths share params: node features must agree closely
        # (pose itself is chaotic under random weights — not asserted)
        v = np.asarray(out32["nodes_ref_valid"])
        f32 = np.asarray(out32["ref_feats_c"])[v]
        f16 = np.asarray(out16["ref_feats_c"])[v]
        cos = np.sum(f32 * f16, axis=1) / (
            np.linalg.norm(f32, axis=1) * np.linalg.norm(f16, axis=1) + 1e-9
        )
        assert np.median(cos) > 0.98, float(np.median(cos))

    def test_bf16_param_dtype_unchanged(self, pair):
        cfg32, batch, tf = pair
        cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
        model16 = RDMNet(cfg16)
        params = model16.init(jax.random.PRNGKey(0), batch, training=False, with_gt=False)
        dtypes = {x.dtype for x in jax.tree.leaves(params)}
        # master params stay f32 (mixed-precision: cast at use)
        assert all(d in (jnp.float32, jnp.int32) for d in dtypes)
