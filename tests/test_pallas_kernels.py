"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.nn.sinkhorn import LearnableLogOptimalTransport, log_sinkhorn
from rdmnet_tpu.ops.pallas.sinkhorn import sinkhorn_pallas


class TestSinkhornPallas:
    def test_matches_scan_implementation(self, rng):
        p, k1 = 5, 17
        scores = rng.randn(p, k1, k1).astype(np.float32)
        log_mu = rng.randn(p, k1).astype(np.float32) * 0.1
        log_nu = rng.randn(p, k1).astype(np.float32) * 0.1
        want = log_sinkhorn(jnp.asarray(scores), jnp.asarray(log_mu),
                            jnp.asarray(log_nu), 30)
        got = sinkhorn_pallas(jnp.asarray(scores), jnp.asarray(log_mu),
                              jnp.asarray(log_nu), 30, block_patches=2,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_block_choice_is_mosaic_legal(self):
        """The (bp, K1) marginal blocks put bp in Mosaic's sublane slot:
        any multi-block grid needs bp % 8 == 0, a single block needs
        bp == padded P. Caught on chip by scripts/tpu_smoke.py (r3): the
        old min(block_patches, p) choice produced block (4, 33) over array
        (8, 33), which the TPU lowering rejects."""
        from rdmnet_tpu.ops.pallas.sinkhorn import _choose_block

        for p in range(1, 41):
            for req in (1, 2, 3, 4, 7, 8, 12, 16, 64):
                bp, pad = _choose_block(p, req)
                padded = p + pad
                assert padded % bp == 0
                assert bp == padded or bp % 8 == 0, (p, req, bp, pad)
        # the exact shape that failed on chip
        assert _choose_block(8, 4) == (8, 0)
        # rounding keeps multi-block grids when P allows it
        assert _choose_block(20, 4) == (8, 4)

    def test_module_pallas_path_matches(self, rng):
        model = LearnableLogOptimalTransport(num_iterations=25)
        scores = jnp.asarray(rng.randn(4, 8, 8).astype(np.float32))
        row_valid = jnp.asarray(rng.rand(4, 8) > 0.2)
        col_valid = jnp.asarray(rng.rand(4, 8) > 0.2)
        params = model.init(jax.random.PRNGKey(0), scores)
        a = model.apply(params, scores, row_valid, col_valid, use_pallas=False)
        b = model.apply(params, scores, row_valid, col_valid, use_pallas=True)
        mask = np.isfinite(np.asarray(a))
        np.testing.assert_allclose(
            np.asarray(a)[mask], np.asarray(b)[mask], rtol=1e-4, atol=1e-4
        )


class TestRadiusKnnPallas:
    def test_matches_exact_radius_knn(self, rng):
        """Pin the kernel's EXACT-search contract against the jnp path
        (same neighbor sets, same ascending-distance order, same
        sentinels) — interpret mode on CPU."""
        from rdmnet_tpu.ops.pallas.radius_knn import radius_knn_pallas
        from rdmnet_tpu.ops.radius_search import radius_knn

        q = (rng.rand(50, 3) * 6).astype(np.float32)
        s = (rng.rand(300, 3) * 6).astype(np.float32)
        s_count = jnp.int32(280)  # last 20 rows invalid
        radius, k = 1.0, 8

        want = np.asarray(radius_knn(
            jnp.asarray(q), jnp.asarray(s), s_count, radius, k,
            approx_recall=None,  # exact path
        ))
        got = np.asarray(radius_knn_pallas(
            jnp.asarray(q), jnp.asarray(s), s_count, radius, k,
            tile_q=16, block_s=64, interpret=True,
        ))
        np.testing.assert_array_equal(got, want)
