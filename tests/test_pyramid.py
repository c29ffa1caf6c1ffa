"""Pyramid builder tests: structure, parity with a numpy oracle, jit-ability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.config import PyramidConfig
from rdmnet_tpu.graph import build_cloud_pyramid, build_pair_batch
from rdmnet_tpu.graph.pyramid import pad_cloud

SPEC = PyramidConfig(
    num_stages=3,
    voxel_size=0.5,
    search_radius=1.0,
    caps=(256, 128, 64),
    neighbor_limits=(12, 12, 12),
    build_upsampling_from_level=0,  # build all tables for oracle checks
    upsampling_limit=None,          # full-width tables for oracle checks
)


def _oracle_subsample(pts, voxel):
    origin = np.floor(pts.min(0) / voxel) * voxel
    coords = np.floor((pts - origin) / voxel).astype(np.int64)
    cells = {}
    for p, c in zip(pts, coords):
        cells.setdefault(tuple(c), []).append(p)
    return np.array([np.mean(v, 0) for v in cells.values()])


def _oracle_radius_nn(q, s, radius, k):
    d = np.sqrt(((q[:, None] - s[None]) ** 2).sum(-1))
    out = np.full((len(q), k), len(s), np.int64)
    for i in range(len(q)):
        within = np.where(d[i] <= radius)[0]
        order = within[np.argsort(d[i][within], kind="stable")][:k]
        out[i, : len(order)] = order
    return out


class TestCloudPyramid:
    def test_structure(self, rng):
        pts = (rng.rand(200, 3) * 8).astype(np.float32)
        padded, cnt = pad_cloud(jnp.asarray(pts), 256)
        pyr = build_cloud_pyramid(padded, cnt, SPEC)
        assert pyr.num_stages == 3
        assert [p.shape for p in pyr.points] == [(256, 3), (128, 3), (64, 3)]
        assert [n.shape for n in pyr.neighbors] == [(256, 12), (128, 12), (64, 12)]
        assert [s.shape for s in pyr.subsampling] == [(128, 12), (64, 12)]
        assert [u.shape for u in pyr.upsampling] == [(256, 12), (128, 12)]
        counts = [int(c) for c in pyr.counts]
        assert counts[0] == 200 and counts[1] >= counts[2] > 0

    def test_neighbor_tables_match_oracle(self, rng):
        pts_in = (rng.rand(150, 3) * 6).astype(np.float32)
        padded, cnt = pad_cloud(jnp.asarray(pts_in), 256)
        pyr = build_cloud_pyramid(padded, cnt, SPEC)
        # level 0 is spatially re-sorted by the builder (same point set,
        # valid-prefix preserved); oracle checks use the builder's order
        pts = np.asarray(pyr.points[0])[:150]
        np.testing.assert_allclose(
            np.sort(pts, axis=0), np.sort(pts_in, axis=0), atol=1e-6
        )

        # oracle pyramid levels (order-insensitive: compare as point sets)
        lvl1 = _oracle_subsample(pts, 1.0)
        lvl2 = _oracle_subsample(np.asarray(pyr.points[1])[: int(pyr.counts[1])], 2.0)
        c1 = int(pyr.counts[1])
        got1 = np.asarray(pyr.points[1])[:c1]
        assert c1 == len(lvl1)
        np.testing.assert_allclose(
            np.sort(got1, axis=0), np.sort(lvl1, axis=0), atol=1e-4
        )

        # level-0 self-neighbors vs oracle (distance-parity per row)
        nbr0 = np.asarray(pyr.neighbors[0])[:150]
        want0 = _oracle_radius_nn(pts, pts, 1.0, 12)
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        for i in range(150):
            g, w = nbr0[i][nbr0[i] < 256], want0[i][want0[i] < 150]
            assert len(g) == len(w)
            np.testing.assert_allclose(d[i][g], d[i][w], atol=1e-5)

        # subsampling table: level-1 queries into level 0 at radius 1.0
        sub0 = np.asarray(pyr.subsampling[0])[:c1]
        want_sub = _oracle_radius_nn(got1, pts, 1.0, 12)
        d10 = np.sqrt(((got1[:, None] - pts[None]) ** 2).sum(-1))
        for i in range(c1):
            g, w = sub0[i][sub0[i] < 256], want_sub[i][want_sub[i] < 150]
            np.testing.assert_allclose(d10[i][g], d10[i][w], atol=1e-5)

        # upsampling table: level-0 queries into level 1 at radius 2.0
        up0 = np.asarray(pyr.upsampling[0])[:150]
        want_up = _oracle_radius_nn(pts, got1, 2.0, 12)
        d01 = d10.T
        for i in range(150):
            g, w = up0[i][up0[i] < 128], want_up[i][want_up[i] < c1]
            np.testing.assert_allclose(d01[i][g], d01[i][w], atol=1e-5)

    def test_jit_compiles_once(self, rng):
        pts = (rng.rand(100, 3) * 5).astype(np.float32)
        fn = jax.jit(lambda p, c: build_cloud_pyramid(p, c, SPEC))
        padded, cnt = pad_cloud(jnp.asarray(pts), 256)
        pyr1 = fn(padded, cnt)
        pts2 = (rng.rand(180, 3) * 5).astype(np.float32)
        padded2, cnt2 = pad_cloud(jnp.asarray(pts2), 256)
        pyr2 = fn(padded2, cnt2)  # same shapes -> no recompile
        assert int(pyr1.counts[0]) == 100 and int(pyr2.counts[0]) == 180


class TestUpsamplingSkip:
    def test_default_skips_level0_table(self, rng):
        import dataclasses
        spec = dataclasses.replace(SPEC, build_upsampling_from_level=1)
        pts = (rng.rand(150, 3) * 6).astype(np.float32)
        padded, cnt = pad_cloud(jnp.asarray(pts), 256)
        pyr = build_cloud_pyramid(padded, cnt, spec)
        # placeholder: all sentinels, right shape
        assert pyr.upsampling[0].shape == (256, 12)
        assert np.all(np.asarray(pyr.upsampling[0]) == 128)
        # level-1 table still real
        assert (np.asarray(pyr.upsampling[1]) < 64).any()


class TestUpsamplingLimit:
    def test_single_column_equals_full_table_nearest(self, rng):
        """upsampling_limit=1 (runtime default) must yield exactly the
        first column of the reference-width table: the decoder's
        nearest_upsample reads only column 0, so these are provably
        identical decoder inputs."""
        import dataclasses

        full = dataclasses.replace(SPEC, approx_recall=None)
        slim = dataclasses.replace(SPEC, approx_recall=None, upsampling_limit=1)
        pts = (rng.rand(200, 3) * 8).astype(np.float32)
        padded, cnt = pad_cloud(jnp.asarray(pts), 256)
        pyr_full = build_cloud_pyramid(padded, cnt, full)
        pyr_slim = build_cloud_pyramid(padded, cnt, slim)
        for i in range(2):
            assert pyr_slim.upsampling[i].shape[1] == 1
            np.testing.assert_array_equal(
                np.asarray(pyr_slim.upsampling[i])[:, 0],
                np.asarray(pyr_full.upsampling[i])[:, 0],
            )

    def test_k1_search_is_exact_under_approx_recall(self, rng):
        """With approx_recall set (runtime default), the k=1 upsampling
        search must still be the EXACT nearest (approx top-k only trades
        recall on the farthest neighbors, never acceptable at k=1)."""
        import dataclasses

        slim_approx = dataclasses.replace(SPEC, upsampling_limit=1)
        slim_exact = dataclasses.replace(
            SPEC, approx_recall=None, upsampling_limit=1
        )
        assert slim_approx.approx_recall is not None
        pts = (rng.rand(220, 3) * 8).astype(np.float32)
        padded, cnt = pad_cloud(jnp.asarray(pts), 256)
        a = build_cloud_pyramid(padded, cnt, slim_approx)
        b = build_cloud_pyramid(padded, cnt, slim_exact)
        for i in range(2):
            np.testing.assert_array_equal(
                np.asarray(a.upsampling[i]), np.asarray(b.upsampling[i])
            )


class TestPairBatch:
    def test_build_pair(self, rng):
        ref = (rng.rand(120, 3) * 6).astype(np.float32)
        src = (rng.rand(140, 3) * 6).astype(np.float32)
        rp, rc = pad_cloud(jnp.asarray(ref), 256)
        sp, sc = pad_cloud(jnp.asarray(src), 256)
        batch = build_pair_batch(rp, rc, sp, sc, jnp.eye(4), SPEC)
        assert batch.ref_feats.shape == (256, 1)
        # ones on valid rows, zeros on pads
        f = np.asarray(batch.ref_feats[:, 0])
        assert f[:120].sum() == 120 and f[120:].sum() == 0
        assert batch.transform.shape == (4, 4)

    @pytest.mark.slow  # vmapped pair-batch compile, ~20 s on CPU
    def test_pair_batch_vmaps(self, rng):
        def build(r, rc, s, sc, tf):
            return build_pair_batch(r, rc, s, sc, tf, SPEC)

        refs = jnp.asarray((rng.rand(2, 256, 3) * 6).astype(np.float32))
        srcs = jnp.asarray((rng.rand(2, 256, 3) * 6).astype(np.float32))
        counts = jnp.asarray([200, 256], jnp.int32)
        tfs = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
        batched = jax.vmap(build)(refs, counts, srcs, counts, tfs)
        assert batched.ref.points[1].shape == (2, 128, 3)
        assert batched.ref.neighbors[0].shape == (2, 256, 12)
