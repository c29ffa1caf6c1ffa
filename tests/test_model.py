"""Full-model forward tests on the tiny config."""

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
def setup():
    cfg = make_tiny_cfg()
    rng = np.random.RandomState(7351)
    tf = random_transform(rng, max_angle=0.3, max_trans=1.0)
    src = (rng.rand(400, 3) * 20).astype(np.float32)
    # ref = transformed src + extra points -> strong overlap
    ref = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(tf)))
    rp, rc = pad_cloud(jnp.asarray(ref), 512)
    sp, sc = pad_cloud(jnp.asarray(src), 512)
    batch = build_pair_batch(rp, rc, sp, sc, jnp.asarray(tf), cfg.pyramid)
    model = RDMNet(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, training=False, with_gt=True)
    return cfg, model, params, batch, tf


class TestRDMNetForward:
    def test_eval_mode_outputs(self, setup):
        cfg, model, params, batch, tf = setup
        out = model.apply(params, batch, training=False, with_gt=True)
        assert out["estimated_transform"].shape == (4, 4)
        p = cfg.coarse_matching.num_correspondences
        k = cfg.model.num_points_in_patch
        assert out["matching_scores"].shape == (p, k + 1, k + 1)
        for key in [
            "estimated_transform", "corr_scores", "gt_node_corr_overlaps",
            "ref_feats_c", "src_feats_c", "ref_feats_f", "src_feats_f",
        ]:
            assert np.isfinite(np.asarray(out[key])).all(), key

    def test_gt_overlaps_nonzero_for_overlapping_pair(self, setup):
        cfg, model, params, batch, tf = setup
        out = model.apply(params, batch, training=False, with_gt=True)
        ov = np.asarray(out["gt_node_corr_overlaps"])
        assert ov.max() > 0.5  # identical clouds -> strong node overlaps

    def test_training_mode(self, setup):
        cfg, model, params, batch, tf = setup
        out = model.apply(
            params, batch, training=True, with_gt=True,
            target_key=jax.random.PRNGKey(3),
        )
        p = cfg.coarse_matching.num_targets
        k = cfg.model.num_points_in_patch
        assert out["matching_scores"].shape == (p, k + 1, k + 1)
        assert "estimated_transform" not in out
        assert "vote_mask_mat" in out

    def test_inference_mode_no_gt(self, setup):
        cfg, model, params, batch, tf = setup
        out = model.apply(params, batch, training=False, with_gt=False)
        assert "gt_node_corr_overlaps" not in out
        assert out["estimated_transform"].shape == (4, 4)

    def test_grads_flow(self, setup):
        cfg, model, params, batch, tf = setup

        def loss_fn(p):
            out = model.apply(
                p, batch, training=True, with_gt=True,
                target_key=jax.random.PRNGKey(0),
            )
            # toy loss over differentiable outputs
            return (
                jnp.sum(out["matching_scores"][:, :-1, :-1] ** 2) * 1e-6
                + jnp.sum(out["ref_feats_c"] ** 2) * 1e-6
                + jnp.sum(out["shifted_ref_points_c"] ** 2) * 1e-9
            )

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
        assert total > 0


class TestCoarseModuleVariants:
    """cfg.model.coarse_module selects the coarse transformer family —
    the original GeoTransformer RPE stack and the absolute-PE ablation the
    reference keeps alongside ThDRoFormer (experiments/model.py:9-14,
    thdroformer.py:368-448)."""

    @pytest.mark.parametrize("kind", ["geotransformer", "ape"])
    def test_variant_forward_and_params(self, setup, kind):
        import dataclasses

        cfg0, _, _, batch, tf = setup
        cfg = dataclasses.replace(
            cfg0, model=dataclasses.replace(cfg0.model, coarse_module=kind)
        )
        model = RDMNet(cfg)
        params = model.init(
            jax.random.PRNGKey(0), batch, training=False, with_gt=True
        )
        names = params["params"].keys()
        assert "transformer" in names and "transformer2" in names
        marker = {"geotransformer": "embedding", "ape": "embedding"}[kind]
        assert marker in params["params"]["transformer"]
        out = model.apply(params, batch, training=False, with_gt=True)
        assert out["estimated_transform"].shape == (4, 4)
        assert np.all(np.isfinite(np.asarray(out["estimated_transform"])))
        assert np.all(np.isfinite(np.asarray(out["ref_feats_c"])))

    def test_unknown_variant_raises(self, setup):
        import dataclasses

        cfg0, _, _, batch, tf = setup
        cfg = dataclasses.replace(
            cfg0, model=dataclasses.replace(cfg0.model, coarse_module="nope")
        )
        with pytest.raises(ValueError, match="coarse_module"):
            RDMNet(cfg).init(
                jax.random.PRNGKey(0), batch, training=False, with_gt=True
            )
