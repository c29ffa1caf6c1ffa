"""Conditional transformer variants + visualization + converter smoke tests."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.nn.kpconv import global_avgpool
from rdmnet_tpu.nn.transformers import (
    LRPEConditionalTransformer,
    LearnablePositionalEmbedding,
    PEConditionalTransformer,
    VanillaConditionalTransformer,
)
from rdmnet_tpu.utils.torch_convert import convert_state_dict
from rdmnet_tpu.utils.visualization import (
    export_correspondences,
    export_votes,
    write_ply_points,
)


class TestConditionalVariants:
    def _feats(self, rng):
        return (
            jnp.asarray(rng.randn(10, 16).astype(np.float32)),
            jnp.asarray(rng.randn(8, 16).astype(np.float32)),
        )

    def test_vanilla(self, rng):
        rf, sf = self._feats(rng)
        m = VanillaConditionalTransformer(("self", "cross"), 16, 2)
        params = m.init(jax.random.PRNGKey(0), rf, sf)
        out_r, out_s = m.apply(params, rf, sf)
        assert out_r.shape == rf.shape and out_s.shape == sf.shape

    def test_pe(self, rng):
        rf, sf = self._feats(rng)
        re = jnp.asarray(rng.randn(10, 16).astype(np.float32))
        se = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        m = PEConditionalTransformer(("self", "cross"), 16, 2)
        params = m.init(jax.random.PRNGKey(0), rf, sf, re, se)
        out_r, _ = m.apply(params, rf, sf, re, se)
        assert np.isfinite(np.asarray(out_r)).all()

    def test_lrpe(self, rng):
        rf, sf = self._feats(rng)
        ridx = jnp.asarray((rng.rand(10, 10) * 100).astype(np.int32))
        sidx = jnp.asarray((rng.rand(8, 8) * 100).astype(np.int32))
        m = LRPEConditionalTransformer(("self", "cross"), 16, 2, num_embeddings=32)
        params = m.init(jax.random.PRNGKey(0), rf, sf, ridx, sidx)
        out_r, _ = m.apply(params, rf, sf, ridx, sidx)
        assert np.isfinite(np.asarray(out_r)).all()

    def test_learnable_embedding_truncates(self, rng):
        m = LearnablePositionalEmbedding(8, 4)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray([0, 100]))
        out = m.apply(params, jnp.asarray([7, 100]))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))


class TestGlobalAvgPool:
    def test_masked(self, rng):
        x = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]])
        mask = jnp.asarray([True, True, False])
        out = np.asarray(global_avgpool(x, mask))
        np.testing.assert_allclose(out, [2.0, 3.0])


class TestVisualization:
    def test_ply_exports(self, tmp_path, rng):
        pts = rng.rand(20, 3).astype(np.float32)
        write_ply_points(str(tmp_path / "p.ply"), pts, rng.rand(20, 3))
        export_correspondences(
            str(tmp_path), pts, pts + 1, pts[:5], pts[:5] + 1,
            corr_correct=np.array([1, 1, 0, 1, 0]),
        )
        export_votes(str(tmp_path), pts, pts + 0.1, keep_mask=rng.rand(20) > 0.5)
        for name in ["p.ply", "ref_points.ply", "correspondences_correct.ply",
                     "vote_offsets.ply"]:
            assert osp.exists(tmp_path / name)
        header = (tmp_path / "p.ply").read_text().splitlines()
        assert header[0] == "ply" and "element vertex 20" in header[2]


class TestTorchConvert:
    def test_linear_and_norm_mapping(self):
        sd = {
            "proj_n2p_score.weight": np.ones((1, 256), np.float32),
            "proj_n2p_score.bias": np.zeros((1,), np.float32),
            "optimal_transport.alpha": np.asarray(1.5, np.float32),
            "encoder.encoder1_1.KPConv.weights": np.ones((15, 1, 64), np.float32),
            "encoder.encoder1_1.norm.weight": np.ones((64,), np.float32),
        }
        tree = convert_state_dict(sd)
        assert tree["proj_n2p_score"]["kernel"].shape == (256, 1)
        assert tree["optimal_transport"]["alpha"].shape == ()
        assert tree["encoder"]["encoder1_1"]["KPConv"]["weights"].shape == (15, 1, 64)
        assert tree["encoder"]["encoder1_1"]["norm"]["scale"].shape == (64,)

    def test_transformer_layer_mapping(self):
        sd = {
            "transformer.transformer.layers.0.attention.attention.proj_q.weight":
                np.ones((128, 128), np.float32),
            "transformer.transformer.layers.1.attention.attention.proj_q.weight":
                np.ones((128, 128), np.float32),
            "transformer.transformer.layers.0.output.expand.weight":
                np.ones((256, 128), np.float32),
        }
        tree = convert_state_dict(sd)
        # the reference's inner `.transformer.` stack collapses onto our
        # flat module names (validated key-for-key by
        # tests/test_golden_e2e.py::test_converter_tree_is_exact)
        t = tree["transformer"]
        assert "self_0" in t and "cross_0" in t
        assert t["self_0"]["attention"]["proj_q"]["kernel"].shape == (128, 128)
        assert t["self_0"]["output"]["expand"]["kernel"].shape == (128, 256)

    def test_parity_cfg_preset(self):
        """make_parity_cfg applies the reference-faithful knobs converted
        checkpoints require (calibrated limits, exact search, per-layer
        kernels)."""
        from rdmnet_tpu.config import make_parity_cfg

        cfg = make_parity_cfg()
        assert cfg.pyramid.neighbor_limits == (65, 63, 69, 71, 81)
        assert cfg.pyramid.approx_recall is None
        assert cfg.backbone.shared_influence is False
        assert cfg.eval_matmul_precision == "highest"
