"""Native C++ graph builder: parity with the on-device jax ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.config import PyramidConfig
from rdmnet_tpu.graph import native
from rdmnet_tpu.graph.pyramid import build_cloud_pyramid, pad_cloud
from rdmnet_tpu.ops import grid_subsample, radius_knn

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")

SPEC = PyramidConfig(
    num_stages=3, voxel_size=0.5, search_radius=1.0,
    caps=(256, 128, 64), neighbor_limits=(12, 12, 12),
)


class TestNativeParity:
    def test_grid_subsample_matches_device(self, rng):
        pts = (rng.rand(200, 3) * 8).astype(np.float32)
        nat, n_nat = native.grid_subsample_native(pts, 1.0, 160)
        dev, n_dev = grid_subsample(
            jnp.asarray(np.pad(pts, ((0, 56), (0, 0)), constant_values=1e9)),
            jnp.int32(200), 1.0, 160,
        )
        assert n_nat == int(n_dev)
        # both are (z, y, x)-lexicographically ordered -> exact row order match
        np.testing.assert_allclose(nat[:n_nat], np.asarray(dev)[:n_nat], atol=1e-5)

    def test_radius_knn_matches_device(self, rng):
        s = (rng.rand(100, 3) * 4).astype(np.float32)
        q = (rng.rand(40, 3) * 4).astype(np.float32)
        nat = native.radius_knn_native(q, s, 100, 1.0, 8)
        dev = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(s), jnp.int32(100), 1.0, 8))
        d = ((q[:, None] - s[None]) ** 2).sum(-1)
        for i in range(40):
            a, b = nat[i][nat[i] < 100], dev[i][dev[i] < 100]
            assert len(a) == len(b)
            np.testing.assert_allclose(d[i][a], d[i][b], atol=1e-5)

    def test_full_pyramid_matches_device(self, rng):
        pts = (rng.rand(180, 3) * 6).astype(np.float32)
        nat = native.build_pyramid_native(pts, SPEC)
        padded, cnt = pad_cloud(jnp.asarray(pts), 256)
        dev = build_cloud_pyramid(padded, cnt, SPEC)
        for lvl in range(3):
            assert nat["counts"][lvl] == int(dev.counts[lvl])
            n = nat["counts"][lvl]
            np.testing.assert_allclose(
                nat["points"][lvl][:n], np.asarray(dev.points[lvl])[:n], atol=1e-4
            )
        # neighbor tables: identical sets per row (order can differ on ties)
        for lvl in range(3):
            n = nat["counts"][lvl]
            a = nat["neighbors"][lvl][:n]
            b = np.asarray(dev.neighbors[lvl])[:n]
            assert (np.sort(a, 1) == np.sort(b, 1)).mean() > 0.99
