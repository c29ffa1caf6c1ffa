"""Data-parallel correctness: the dp=8 sharded train step must compute the
same loss/gradients as the identical unsharded step on one device.

This is the DDP-semantics contract of the reference
(geotransformer/engine/base_trainer.py:181-198: DDP all-reduce makes the
multi-GPU step equivalent to a big-batch single step); here XLA's sharding
propagation inserts the psum, and this test pins that equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.config import make_tiny_cfg
from rdmnet_tpu.engine import create_train_state
from rdmnet_tpu.engine.train_step import make_value_and_grad
from rdmnet_tpu.parallel import make_mesh, replicate_to_mesh, shard_batch
from tests.test_train import make_batch


@pytest.mark.slow
def test_dp8_grads_match_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = make_tiny_cfg()
    batch = make_batch(cfg, None, bsz=8, n=300)
    single = jax.tree.map(lambda x: x[0], batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), single, steps_per_epoch=10)
    vag = make_value_and_grad(cfg)
    key = jax.random.PRNGKey(1)

    # reference: whole 8-pair batch on the default device
    ref_metrics, ref_grads = vag(state, batch, key)

    # dp=8: same batch sharded over the mesh, params replicated
    mesh = make_mesh(8)
    with mesh:
        dp_metrics, dp_grads = vag(
            replicate_to_mesh(state, mesh), shard_batch(batch, mesh), key
        )

    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(dp_metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-3
    )
    # raw gradients agree leaf-by-leaf. Tolerance is 1% of the leaf's max
    # magnitude: sharded vs unsharded layouts change op-level reduction
    # order, and the Sinkhorn/matching chain amplifies that to ~0.6%
    # (measured); a structural DP error (missing psum, wrong mean) would be
    # off by factors. Post-Adam params are NOT compared: for near-zero grads
    # the normalized update direction is ill-conditioned against this noise.
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(dp_grads)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-2 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, atol=tol)


@pytest.mark.slow
def test_unified_2d_mesh_dp_sp():
    """ONE 2-D (dp x sp) mesh serves both regimes: the train
    value-and-grad with the batch sharded over 'dp' (sp-replicated), and
    the sp-sharded search with queries sharded over 'sp' (dp-replicated) —
    the composed pod-slice layout validated by dryrun_multichip, pinned
    here against the single-device results at tiny scale."""
    from rdmnet_tpu.engine.train_step import make_value_and_grad
    from rdmnet_tpu.ops import radius_knn
    from rdmnet_tpu.parallel.sharded_search import sharded_radius_knn

    assert len(jax.devices()) >= 8
    cfg = make_tiny_cfg()
    batch = make_batch(cfg, None, bsz=4, n=250)
    single = jax.tree.map(lambda x: x[0], batch)
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), single, steps_per_epoch=10
    )
    vag = make_value_and_grad(cfg)
    key = jax.random.PRNGKey(1)
    ref_metrics, _ = vag(state, batch, key)

    mesh2 = jax.sharding.Mesh(
        np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "sp")
    )
    with mesh2:
        dp_metrics, _ = vag(
            replicate_to_mesh(state, mesh2), shard_batch(batch, mesh2), key
        )
        pts = single.ref.points[0]
        cnt = single.ref.counts[0]
        want = radius_knn(
            pts, pts, cnt, cfg.pyramid.search_radius,
            cfg.pyramid.neighbor_limits[0],
        )
        got = sharded_radius_knn(
            pts, pts, cnt, cfg.pyramid.search_radius,
            cfg.pyramid.neighbor_limits[0], mesh=mesh2, q_count=cnt,
        )
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    assert float(jnp.mean((got == want).astype(jnp.float32))) > 0.99


@pytest.mark.slow
def test_dryrun_multichip_entry():
    """The driver-facing entry must complete under the test env (which
    already provides the 8-device CPU mesh it would otherwise force)."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


class TestShardedSearch:
    """Query-sharded (sp) radius search == single-device result."""

    def _sorted_cloud(self, rng, n, cell=0.5):
        pts = (rng.rand(n, 3) * np.array([40.0, 5.0, 2.0])).astype(np.float32)
        anchor = np.floor(pts.min(0) / cell) * cell
        c = np.floor((pts - anchor) / cell).astype(np.int64)
        key = (c[:, 0] << 40) | (c[:, 1] << 20) | c[:, 2]
        return pts[np.argsort(key, kind="stable")]

    def test_matches_single_device(self, rng):
        from rdmnet_tpu.ops import radius_knn
        from rdmnet_tpu.parallel.sharded_search import sharded_radius_knn

        assert len(jax.devices()) >= 8
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
        s = self._sorted_cloud(rng, 600)
        q = self._sorted_cloud(rng, 402)  # deliberately not divisible by 8
        radius, k = 1.0, 6

        want = np.asarray(
            radius_knn(jnp.asarray(q), jnp.asarray(s), jnp.int32(600), radius, k)
        )
        got = np.asarray(sharded_radius_knn(
            jnp.asarray(q), jnp.asarray(s), jnp.int32(600), radius, k,
            mesh=mesh, q_count=jnp.int32(402),
        ))
        d = ((q[:, None] - s[None]) ** 2).sum(-1)
        for i in range(len(q)):
            a = want[i][want[i] < 600]
            b = got[i][got[i] < 600]
            assert len(a) == len(b)
            np.testing.assert_allclose(d[i][a], d[i][b], atol=1e-5)

    def test_build_pair_batch_sp_sharded_matches(self, rng):
        """The FULL graph build with its big searches sp-sharded must equal
        the single-device build leaf-for-leaf — integration of the sharded
        primitive into build_pair_batch (the end-to-end sp path; the
        TPU-native answer to the reference's per-worker CPU collate,
        geotransformer/utils/data.py:13-77)."""
        from rdmnet_tpu.config import make_tiny_cfg
        from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud

        assert len(jax.devices()) >= 8
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
        cfg = make_tiny_cfg()
        cap = cfg.pyramid.caps[0]
        ref = (rng.rand(400, 3) * np.array([40.0, 8.0, 3.0])).astype(np.float32)
        src = (rng.rand(384, 3) * np.array([40.0, 8.0, 3.0])).astype(np.float32)
        rp, rc = pad_cloud(jnp.asarray(ref), cap)
        sp_, sc = pad_cloud(jnp.asarray(src), cap)

        want = build_pair_batch(rp, rc, sp_, sc, jnp.eye(4), cfg.pyramid)
        with mesh:
            got = build_pair_batch(
                rp, rc, sp_, sc, jnp.eye(4), cfg.pyramid,
                sp_mesh=mesh, sp_min_queries=64,
            )
        flat_w, tree_w = jax.tree_util.tree_flatten_with_path(want)
        flat_g = jax.tree_util.tree_flatten(got)[0]
        for (path, a), b in zip(flat_w, flat_g):
            name = jax.tree_util.keystr(path)
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape, name
            np.testing.assert_array_equal(b, a, err_msg=name)

    def test_banded_matches_single_device(self, rng):
        from rdmnet_tpu.ops import radius_knn_banded
        from rdmnet_tpu.parallel.sharded_search import sharded_radius_knn

        assert len(jax.devices()) >= 8
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
        cell, radius, k = 0.5, 1.0, 6
        s = self._sorted_cloud(rng, 640, cell)
        q = self._sorted_cloud(rng, 512, cell)

        want = np.asarray(radius_knn_banded(
            jnp.asarray(q), jnp.asarray(s), jnp.int32(640), radius, k,
            cell=cell, band_cap=256, q_count=jnp.int32(512), chunk_size=64,
        ))
        got = np.asarray(sharded_radius_knn(
            jnp.asarray(q), jnp.asarray(s), jnp.int32(640), radius, k,
            mesh=mesh, q_count=jnp.int32(512), cell=cell, band_cap=256,
            chunk_size=64,
        ))
        d = ((q[:, None] - s[None]) ** 2).sum(-1)
        for i in range(len(q)):
            a = want[i][want[i] < 640]
            b = got[i][got[i] < 640]
            assert len(a) == len(b)
            np.testing.assert_allclose(d[i][a], d[i][b], atol=1e-5)
