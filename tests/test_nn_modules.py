"""Module-level tests: sinkhorn, rotary attention, vote, matching, LGR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.config import FineMatchingConfig, VoteConfig
from rdmnet_tpu.nn.attention import rotary_rotate
from rdmnet_tpu.nn.matching import superpoint_matching, superpoint_target_sample
from rdmnet_tpu.nn.sinkhorn import LearnableLogOptimalTransport
from rdmnet_tpu.nn.thdroformer import ThDRoFormer
from rdmnet_tpu.nn.vote import VoteLayer
from rdmnet_tpu.ops.geometry import apply_transform
from rdmnet_tpu.ops.lgr import local_to_global_registration
from tests.test_ops_core import random_transform


class TestSinkhorn:
    def test_marginals(self, rng):
        """Transport plan rows/cols must sum to the prescribed marginals."""
        model = LearnableLogOptimalTransport(num_iterations=200)
        scores = jnp.asarray(rng.randn(2, 8, 10).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), scores)
        out = model.apply(params, scores)  # (2, 9, 11) log plan
        plan = np.exp(np.asarray(out))
        # the reference rescales the plan by (m+n) at the end
        # (learnable_sinkhorn.py:64): total mass m+n, each real row sums to 1,
        # the dustbin row absorbs n
        np.testing.assert_allclose(plan.sum((1, 2)), 18.0, rtol=1e-3)
        np.testing.assert_allclose(plan[:, :8, :].sum(2), 1.0, rtol=1e-3)
        np.testing.assert_allclose(plan[:, 8, :].sum(1), 10.0, rtol=1e-3)

    def test_masked_rows_get_no_mass(self, rng):
        model = LearnableLogOptimalTransport(num_iterations=100)
        scores = jnp.asarray(rng.randn(1, 6, 6).astype(np.float32))
        row_valid = jnp.asarray([[True] * 4 + [False] * 2])
        col_valid = jnp.asarray([[True] * 5 + [False]])
        params = model.init(jax.random.PRNGKey(0), scores)
        out = np.exp(np.asarray(model.apply(params, scores, row_valid, col_valid)))
        assert out[0, 4:6, :].sum() < 1e-6
        assert out[0, :, 5].sum() < 1e-6
        assert np.isfinite(out).all()

    def test_fully_masked_patch_is_finite(self, rng):
        model = LearnableLogOptimalTransport(num_iterations=10)
        scores = jnp.zeros((1, 4, 4))
        row_valid = jnp.zeros((1, 4), bool)
        col_valid = jnp.zeros((1, 4), bool)
        params = model.init(jax.random.PRNGKey(0), scores)
        out = np.asarray(model.apply(params, scores, row_valid, col_valid))
        assert np.isfinite(np.exp(out)).all()


class TestRotary:
    def test_rotation_preserves_norm(self, rng):
        x = jnp.asarray(rng.randn(4, 10, 32).astype(np.float32))
        theta = jnp.asarray(rng.rand(4, 10, 16).astype(np.float32) * 2 * np.pi)
        y = rotary_rotate(x, theta)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )

    def test_zero_angle_identity(self, rng):
        x = jnp.asarray(rng.randn(3, 8).astype(np.float32))
        y = rotary_rotate(x, jnp.zeros((3, 4)))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_relative_property(self, rng):
        """q·k after rotation depends on angle difference only."""
        q = jnp.asarray(rng.randn(8).astype(np.float32))
        k = jnp.asarray(rng.randn(8).astype(np.float32))
        a = jnp.asarray(rng.rand(4).astype(np.float32))
        b = jnp.asarray(rng.rand(4).astype(np.float32))
        shift = jnp.asarray(rng.rand(4).astype(np.float32))
        dot1 = jnp.dot(rotary_rotate(q, a), rotary_rotate(k, b))
        dot2 = jnp.dot(rotary_rotate(q, a + shift), rotary_rotate(k, b + shift))
        np.testing.assert_allclose(float(dot1), float(dot2), rtol=1e-4)


class TestThDRoFormer:
    def test_pad_invariance(self, rng):
        """Outputs on valid nodes must not depend on pad-row contents."""
        model = ThDRoFormer(input_dim=32, output_dim=16, hidden_dim=16,
                            num_heads=2, num_layers=1)
        n, m = 12, 10
        rpts = jnp.asarray(rng.rand(n, 3).astype(np.float32))
        spts = jnp.asarray(rng.rand(m, 3).astype(np.float32))
        rf = jnp.asarray(rng.randn(n, 32).astype(np.float32))
        sf = jnp.asarray(rng.randn(m, 32).astype(np.float32))
        rv = jnp.asarray([True] * 8 + [False] * 4)
        sv = jnp.asarray([True] * 7 + [False] * 3)
        params = model.init(jax.random.PRNGKey(0), rpts, spts, rf, sf, rv, sv)
        out1 = model.apply(params, rpts, spts, rf, sf, rv, sv)
        # scramble pad rows
        rf2 = rf.at[8:].set(99.0)
        sf2 = sf.at[7:].set(-55.0)
        out2 = model.apply(params, rpts, spts, rf2, sf2, rv, sv)
        np.testing.assert_allclose(
            np.asarray(out1[0])[:8], np.asarray(out2[0])[:8], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out1[1])[:7], np.asarray(out2[1])[:7], atol=1e-4
        )

    def test_sparse_topk_runs(self, rng):
        model = ThDRoFormer(input_dim=8, output_dim=8, hidden_dim=16,
                            num_heads=2, num_layers=2, k=(0.5, 0.25))
        pts = jnp.asarray(rng.rand(16, 3).astype(np.float32))
        f = jnp.asarray(rng.randn(16, 8).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), pts, pts, f, f)
        out = model.apply(params, pts, pts, f, f)
        assert np.isfinite(np.asarray(out[0])).all()


class TestVote:
    def test_offset_clamped(self, rng):
        cfg = VoteConfig(max_translate_range=(0.5, 0.5, 0.5), mlps=(16,))
        layer = VoteLayer(cfg, feat_dim=8)
        xyz = jnp.asarray(rng.rand(20, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(20, 8).astype(np.float32) * 100)
        params = layer.init(jax.random.PRNGKey(0), xyz, feats)
        shifted, new_feats = layer.apply(params, xyz, feats)
        offsets = np.asarray(shifted) - np.asarray(xyz)
        assert np.abs(offsets).max() <= 0.5 + 1e-6
        assert new_feats.shape == (20, 8)


class TestSuperPointMatching:
    def test_identical_features_match(self, rng):
        f = rng.randn(10, 16).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        perm = rng.permutation(10)
        ref_idx, src_idx, scores, valid = superpoint_matching(
            jnp.asarray(f), jnp.asarray(f[perm]),
            jnp.ones(10, bool), jnp.ones(10, bool),
            num_correspondences=10,
        )
        got = {(int(r), int(s)) for r, s, v in zip(ref_idx, src_idx, valid) if v}
        want = {(int(perm[j]), int(j)) for j in range(10)}
        assert got == want

    def test_masked_nodes_excluded(self, rng):
        f = rng.randn(8, 4).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        rm = jnp.asarray([True] * 4 + [False] * 4)
        ref_idx, src_idx, _, valid = superpoint_matching(
            jnp.asarray(f), jnp.asarray(f), rm, rm, num_correspondences=64,
        )
        sel_ref = np.asarray(ref_idx)[np.asarray(valid)]
        sel_src = np.asarray(src_idx)[np.asarray(valid)]
        assert sel_ref.max() < 4 and sel_src.max() < 4
        assert len(sel_ref) == 16


class TestTargetSample:
    def test_selects_only_above_threshold(self, rng):
        ov = np.zeros((6, 6), np.float32)
        ov[0, 1] = 0.5
        ov[2, 3] = 0.3
        ov[4, 4] = 0.05  # below threshold
        r, s, o, v = superpoint_target_sample(
            jnp.asarray(ov), num_targets=4, overlap_threshold=0.1,
            key=jax.random.PRNGKey(0),
        )
        got = {(int(a), int(b)) for a, b, k in zip(r, s, v) if k}
        assert got == {(0, 1), (2, 3)}

    def test_subsamples_when_too_many(self, rng):
        ov = (rng.rand(16, 16) > 0.5).astype(np.float32) * 0.9
        r, s, o, v = superpoint_target_sample(
            jnp.asarray(ov), num_targets=8, overlap_threshold=0.1,
            key=jax.random.PRNGKey(1),
        )
        assert int(np.asarray(v).sum()) == 8
        for a, b in zip(np.asarray(r), np.asarray(s)):
            assert ov[a, b] > 0.1


class TestLGR:
    def test_recovers_pose_from_perfect_matches(self, rng):
        """Build patches of true correspondences with diagonal score matrices;
        LGR must recover the GT transform."""
        tf = random_transform(rng, max_angle=0.5, max_trans=2.0)
        p, k = 6, 16
        cfg = FineMatchingConfig(num_refinement_steps=3)
        ref_knn = rng.randn(p, k, 3).astype(np.float32) * 5
        src_knn = np.asarray(
            apply_transform(jnp.asarray(ref_knn), jnp.asarray(np.linalg.inv(tf)))
        )
        masks = np.ones((p, k), bool)
        # log scores: diagonal high, off-diagonal low, dustbin very low
        scores = np.full((p, k + 1, k + 1), -8.0, np.float32)
        for i in range(k):
            scores[:, i, i] = -0.5
        corr_valid = np.ones(p, bool)
        corr, est = local_to_global_registration(
            jnp.asarray(ref_knn), jnp.asarray(src_knn),
            jnp.asarray(masks), jnp.asarray(masks),
            jnp.asarray(scores), jnp.asarray(corr_valid), cfg,
        )
        np.testing.assert_allclose(np.asarray(est), tf, atol=1e-3)

    def test_outlier_patches_rejected(self, rng):
        """One patch with garbage correspondences must not corrupt the pose."""
        tf = random_transform(rng, max_angle=0.4, max_trans=1.0)
        p, k = 5, 16
        cfg = FineMatchingConfig(num_refinement_steps=5)
        ref_knn = rng.randn(p, k, 3).astype(np.float32) * 5
        src_knn = np.array(
            apply_transform(jnp.asarray(ref_knn), jnp.asarray(np.linalg.inv(tf)))
        )
        # corrupt patch 0: its "src" points are random -> its diagonal
        # correspondences are outliers
        src_knn[0] = rng.randn(k, 3) * 5
        scores = np.full((p, k + 1, k + 1), -8.0, np.float32)
        for i in range(k):
            scores[:, i, i] = -0.5
        masks = np.ones((p, k), bool)
        corr, est = local_to_global_registration(
            jnp.asarray(ref_knn), jnp.asarray(src_knn),
            jnp.asarray(masks), jnp.asarray(masks),
            jnp.asarray(scores), jnp.asarray(np.ones(p, bool)), cfg,
        )
        np.testing.assert_allclose(np.asarray(est), tf, atol=1e-3)

    def test_invalid_corr_contribute_nothing(self, rng):
        tf = random_transform(rng, max_angle=0.4, max_trans=1.0)
        p, k = 4, 8
        cfg = FineMatchingConfig(num_refinement_steps=2)
        ref_knn = rng.randn(p, k, 3).astype(np.float32) * 5
        src_knn = np.array(
            apply_transform(jnp.asarray(ref_knn), jnp.asarray(np.linalg.inv(tf)))
        )
        scores = np.full((p, k + 1, k + 1), -8.0, np.float32)
        for i in range(k):
            scores[:, i, i] = -0.5
        valid = np.array([True, True, False, False])
        src_knn[2:] = 1e3  # garbage in invalid patches
        corr, est = local_to_global_registration(
            jnp.asarray(ref_knn), jnp.asarray(src_knn),
            jnp.asarray(np.ones((p, k), bool)), jnp.asarray(np.ones((p, k), bool)),
            jnp.asarray(scores), jnp.asarray(valid), cfg,
        )
        w = np.asarray(corr.scores).reshape(p, 2 * k)
        assert w[2:].sum() == 0
        np.testing.assert_allclose(np.asarray(est), tf, atol=1e-3)


class TestFusedGatherEquivalence:
    @pytest.mark.slow  # two full-encoder compiles, ~2 min on CPU
    def test_encoder_fused_matches_unfused(self, rng):
        """shared_influence=True (one influence tensor per level, canonical
        kernels) must equal shared_influence=False (each KPConv computes
        influence from its own kernel_points param) — at init every layer
        holds the canonical disposition, so the two modes are the same
        function."""
        import dataclasses

        from rdmnet_tpu.config import make_tiny_cfg
        from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud, stack_pair_graph
        from rdmnet_tpu.nn.backbone import Encoder

        cfg = make_tiny_cfg()
        pts = (rng.rand(300, 3) * 20).astype(np.float32)
        rp, rc = pad_cloud(jnp.asarray(pts), cfg.pyramid.caps[0])
        batch = build_pair_batch(rp, rc, rp, rc, jnp.eye(4), cfg.pyramid)
        graph = stack_pair_graph(batch.ref, batch.src)
        feats = jnp.concatenate([batch.ref_feats, batch.src_feats], axis=0)

        outs = {}
        for shared in (True, False):
            bb = dataclasses.replace(cfg.backbone, shared_influence=shared)
            enc = Encoder(bb, dtype=jnp.float32)
            params = enc.init(jax.random.PRNGKey(0), feats, graph)
            outs[shared] = enc.apply(params, feats, graph)
        for a, b in zip(outs[True], outs[False]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
