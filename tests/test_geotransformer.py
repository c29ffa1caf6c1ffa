"""GeoTransformer (original) + point matching parity components."""

import jax
import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.config import FineMatchingConfig
from rdmnet_tpu.nn.geotransformer import (
    GeometricStructureEmbedding,
    GeometricTransformer,
    sinusoidal_embedding,
)
from rdmnet_tpu.nn.point_matching import group_and_aggregate, point_matching
from rdmnet_tpu.ops.geometry import apply_transform
from tests.test_ops_core import random_transform


class TestSinusoidal:
    def test_shapes_and_range(self, rng):
        idx = jnp.asarray(rng.rand(5, 7).astype(np.float32) * 10)
        emb = sinusoidal_embedding(idx, 16)
        assert emb.shape == (5, 7, 16)
        assert float(jnp.abs(emb).max()) <= 1.0 + 1e-6

    def test_first_pair_is_sin_cos(self):
        idx = jnp.asarray([2.0])
        emb = np.asarray(sinusoidal_embedding(idx, 8))[0]
        np.testing.assert_allclose(emb[0], np.sin(2.0), atol=1e-6)
        np.testing.assert_allclose(emb[1], np.cos(2.0), atol=1e-6)


class TestGeometricEmbedding:
    def test_se3_invariance(self, rng):
        """Structure embedding must be invariant to rigid transforms."""
        pts = jnp.asarray(rng.rand(20, 3).astype(np.float32) * 5)
        valid = jnp.ones(20, bool)
        m = GeometricStructureEmbedding(16, sigma_d=4.8, sigma_a=15.0, angle_k=3)
        params = m.init(jax.random.PRNGKey(0), pts, valid)
        e1 = m.apply(params, pts, valid)
        tf = jnp.asarray(random_transform(rng))
        e2 = m.apply(params, apply_transform(pts, tf), valid)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-2)


class TestGeometricTransformer:
    def test_forward_shapes(self, rng):
        m = GeometricTransformer(
            input_dim=32, output_dim=16, hidden_dim=16, num_heads=2,
            blocks=("self", "cross"), sigma_d=4.8, sigma_a=15.0, angle_k=3,
        )
        rp = jnp.asarray(rng.rand(12, 3).astype(np.float32))
        sp = jnp.asarray(rng.rand(10, 3).astype(np.float32))
        rf = jnp.asarray(rng.randn(12, 32).astype(np.float32))
        sf = jnp.asarray(rng.randn(10, 32).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), rp, sp, rf, sf)
        out_r, out_s = m.apply(params, rp, sp, rf, sf)
        assert out_r.shape == (12, 16) and out_s.shape == (10, 16)
        assert np.isfinite(np.asarray(out_r)).all()


class TestPointMatching:
    def test_extracts_diagonal(self, rng):
        p, k = 3, 8
        cfg = FineMatchingConfig()
        ref = rng.randn(p, k, 3).astype(np.float32)
        scores = np.full((p, k + 1, k + 1), -8.0, np.float32)
        for i in range(k):
            scores[:, i, i] = -0.5
        corr = point_matching(
            jnp.asarray(ref), jnp.asarray(ref),
            jnp.ones((p, k), bool), jnp.ones((p, k), bool),
            jnp.asarray(scores), jnp.ones(p, bool), cfg,
        )
        w = np.asarray(corr.scores)
        # row side extracts all k diagonal pairs per patch, col side dedupes
        assert (w > 0).sum() == p * k
        sel = w > 0
        np.testing.assert_allclose(
            np.asarray(corr.ref_points)[sel], np.asarray(corr.src_points)[sel]
        )


class TestGroupAndAggregate:
    def test_maxpool_within_radius(self, rng):
        s = jnp.asarray([[0.0, 0, 0], [0.1, 0, 0], [5.0, 0, 0]], jnp.float32)
        feats = jnp.asarray([[1.0], [3.0], [100.0]], jnp.float32)
        q = jnp.asarray([[0.0, 0, 0]], jnp.float32)
        pooled, sizes = group_and_aggregate(q, s, feats, jnp.int32(3), 1.0, 4)
        assert float(pooled[0, 0]) == 3.0
        assert int(sizes[0]) == 2


class TestGeometricEmbeddingSmallClouds:
    def test_fewer_valid_points_than_angle_k(self, rng):
        """With <= angle_k valid points the kNN falls back to masked pairs;
        padded ~1e9 coordinates must not contaminate valid rows'
        embeddings (bounded unit-vector substitution)."""
        pts = np.full((16, 3), 1e9, np.float32)
        pts[:3] = rng.rand(3, 3).astype(np.float32) * 5
        valid = jnp.asarray(np.arange(16) < 3)
        m = GeometricStructureEmbedding(16, sigma_d=4.8, sigma_a=15.0, angle_k=3)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(pts), valid)
        emb = np.asarray(m.apply(params, jnp.asarray(pts), valid))
        sub = emb[:3, :3]
        assert np.isfinite(sub).all()
        # sinusoidal features are bounded; projections stay O(sqrt(D))
        assert np.abs(sub).max() < 1e3, np.abs(sub).max()
