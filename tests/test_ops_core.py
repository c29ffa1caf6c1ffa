"""Golden-value tests for core ops vs small numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.ops import (
    apply_transform,
    grid_subsample,
    greedy_nms,
    inverse_transform,
    pairwise_sq_dist,
    point_to_node_partition,
    radius_knn,
    radius_knn_banded,
    rodrigues_rotation,
    take_padded,
    weighted_procrustes,
)
from rdmnet_tpu.ops.geometry import get_transform_from_rotation_translation


def random_transform(rng, max_angle=np.pi, max_trans=5.0):
    axis = rng.randn(3)
    angle = rng.rand() * max_angle
    r = np.asarray(rodrigues_rotation(jnp.asarray(axis, jnp.float32), jnp.float32(angle)))
    t = rng.randn(3).astype(np.float32) * max_trans
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = r
    tf[:3, 3] = t
    return tf


class TestGeometry:
    def test_pairwise_sq_dist(self, rng):
        x = rng.randn(17, 3).astype(np.float32)
        y = rng.randn(23, 3).astype(np.float32)
        got = np.asarray(pairwise_sq_dist(jnp.asarray(x), jnp.asarray(y)))
        want = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_pairwise_sq_dist_normalized(self, rng):
        x = rng.randn(9, 8).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        y = rng.randn(5, 8).astype(np.float32)
        y /= np.linalg.norm(y, axis=1, keepdims=True)
        got = np.asarray(pairwise_sq_dist(jnp.asarray(x), jnp.asarray(y), normalized=True))
        want = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_apply_and_inverse_transform(self, rng):
        tf = random_transform(rng)
        pts = rng.randn(50, 3).astype(np.float32)
        moved = apply_transform(jnp.asarray(pts), jnp.asarray(tf))
        back = apply_transform(moved, inverse_transform(jnp.asarray(tf)))
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_take_padded_sentinel(self):
        x = jnp.arange(12.0).reshape(4, 3)
        idx = jnp.array([0, 3, 4, 100])  # 4 and 100 are out of range
        got = np.asarray(take_padded(x, idx))
        np.testing.assert_allclose(got[0], [0, 1, 2])
        np.testing.assert_allclose(got[1], [9, 10, 11])
        np.testing.assert_allclose(got[2], 0.0)
        np.testing.assert_allclose(got[3], 0.0)


class TestGridSubsample:
    def _oracle(self, pts, voxel):
        """Voxel-centroid oracle mirroring the C++ semantics."""
        origin = np.floor(pts.min(0) / voxel) * voxel
        coords = np.floor((pts - origin) / voxel).astype(np.int64)
        out = {}
        for p, c in zip(pts, coords):
            out.setdefault(tuple(c), []).append(p)
        return np.array(sorted((np.mean(v, 0) for v in out.values()), key=tuple))

    def test_matches_oracle(self, rng):
        pts = (rng.rand(200, 3) * 10).astype(np.float32)
        n = 150
        voxel = 1.0
        sub, cnt = grid_subsample(jnp.asarray(pts), jnp.int32(n), voxel, cap=160)
        cnt = int(cnt)
        got = np.asarray(sub)[:cnt]
        want = self._oracle(pts[:n], voxel)
        assert cnt == len(want)
        got_sorted = np.array(sorted(got, key=tuple))
        np.testing.assert_allclose(got_sorted, want, atol=1e-4)

    def test_padding_is_far(self, rng):
        pts = rng.rand(64, 3).astype(np.float32)
        sub, cnt = grid_subsample(jnp.asarray(pts), jnp.int32(64), 0.5, cap=64)
        cnt = int(cnt)
        assert np.all(np.asarray(sub)[cnt:] > 1e8)

    def test_jit_and_empty(self):
        pts = jnp.zeros((16, 3))
        fn = jax.jit(lambda p, n: grid_subsample(p, n, 0.5, cap=8))
        sub, cnt = fn(pts, jnp.int32(0))
        assert int(cnt) == 0

    def test_overflow_reported(self, rng):
        """Deliberately undersized cap: the dropped counter must report the
        clipped voxels instead of degrading silently."""
        # 40 points, one per ~unique voxel (spread out)
        pts = (np.arange(40)[:, None] * np.array([1.0, 0.0, 0.0])).astype(np.float32)
        cap = 24
        sub, cnt, dropped = grid_subsample(
            jnp.asarray(pts), jnp.int32(40), 0.9, cap=cap, return_dropped=True
        )
        assert int(cnt) == cap
        assert int(dropped) == 40 - cap

    def test_no_overflow_zero_dropped(self, rng):
        pts = (rng.rand(100, 3) * 10).astype(np.float32)
        _, cnt, dropped = grid_subsample(
            jnp.asarray(pts), jnp.int32(100), 1.0, cap=128, return_dropped=True
        )
        assert int(dropped) == 0
        assert int(cnt) <= 100


class TestRadiusKnn:
    def test_matches_oracle(self, rng):
        s = (rng.rand(100, 3) * 4).astype(np.float32)
        q = (rng.rand(40, 3) * 4).astype(np.float32)
        radius, k = 1.0, 8
        idx = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(s), jnp.int32(100), radius, k))
        d = ((q[:, None] - s[None]) ** 2).sum(-1)
        for i in range(len(q)):
            within = np.where(d[i] <= radius**2)[0]
            order = within[np.argsort(d[i][within], kind="stable")][:k]
            got = idx[i][idx[i] < 100]
            assert len(got) == len(order)
            # distances must match (index ties allowed)
            np.testing.assert_allclose(d[i][got], d[i][order], atol=1e-5)

    def test_sentinel_fill(self, rng):
        s = rng.rand(10, 3).astype(np.float32) + 100.0
        q = np.zeros((3, 3), np.float32)
        idx = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(s), jnp.int32(10), 1.0, 4))
        assert np.all(idx == 10)

    def test_chunked_equals_unchunked(self, rng):
        s = (rng.rand(300, 3) * 4).astype(np.float32)
        q = (rng.rand(500, 3) * 4).astype(np.float32)
        a = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(s), jnp.int32(300), 1.0, 8, chunk_size=128))
        b = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(s), jnp.int32(300), 1.0, 8, chunk_size=4096))
        np.testing.assert_array_equal(a, b)

    def test_invalid_support_excluded(self, rng):
        s = np.zeros((10, 3), np.float32)
        q = np.zeros((1, 3), np.float32)
        idx = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(s), jnp.int32(4), 1.0, 8))
        valid = idx[0][idx[0] < 10]
        assert np.all(valid < 4)


def _xsorted_cloud(rng, n, extent, cell):
    """Random cloud sorted by (x, y, z) cell key — the banded-search
    precondition every pyramid level satisfies by construction."""
    pts = (rng.rand(n, 3) * extent).astype(np.float32)
    anchor = np.floor(pts.min(0) / cell) * cell
    c = np.floor((pts - anchor) / cell).astype(np.int64)
    key = (c[:, 0] << 40) | (c[:, 1] << 20) | c[:, 2]
    return pts[np.argsort(key, kind="stable")]


class TestRadiusKnnBanded:
    def test_matches_full_search(self, rng):
        cell, radius, k = 0.5, 1.0, 8
        s = _xsorted_cloud(rng, 600, np.array([40.0, 4.0, 2.0]), cell)
        q = _xsorted_cloud(rng, 400, np.array([40.0, 4.0, 2.0]), cell)
        full = np.asarray(
            radius_knn(jnp.asarray(q), jnp.asarray(s), jnp.int32(600), radius, k)
        )
        banded, overflow = radius_knn_banded(
            jnp.asarray(q), jnp.asarray(s), jnp.int32(600), radius, k,
            cell=cell, band_cap=256, q_count=jnp.int32(400), chunk_size=64,
            return_overflow=True,
        )
        banded = np.asarray(banded)
        assert int(overflow) == 0
        # same neighbor sets per row (order ties allowed on equal distances)
        d = ((q[:, None] - s[None]) ** 2).sum(-1)
        for i in range(len(q)):
            a = full[i][full[i] < 600]
            b = banded[i][banded[i] < 600]
            assert len(a) == len(b)
            np.testing.assert_allclose(d[i][a], d[i][b], atol=1e-5)

    def test_pads_and_counts(self, rng):
        cell, radius, k = 0.5, 1.0, 6
        s = _xsorted_cloud(rng, 200, np.array([30.0, 3.0, 2.0]), cell)
        s_pad = np.concatenate([s, np.full((56, 3), 1e9, np.float32)])
        q_pad = np.concatenate([s[:50], np.full((14, 3), 1e9, np.float32)])
        idx = np.asarray(radius_knn_banded(
            jnp.asarray(q_pad), jnp.asarray(s_pad), jnp.int32(200), radius, k,
            cell=cell, band_cap=128, q_count=jnp.int32(50), chunk_size=32,
        ))
        assert idx.shape == (64, k)
        # pad queries find nothing; valid queries never point at pad support
        assert np.all(idx[50:] == 256)
        valid_hits = idx[:50][idx[:50] < 256]
        assert np.all(valid_hits < 200)
        # every valid query finds at least itself
        assert np.all((idx[:50] < 256).sum(1) >= 1)

    def test_overflow_reported_when_band_undersized(self, rng):
        cell, radius, k = 0.5, 2.0, 4
        # dense cloud in a thin x-slab: every chunk's band is the whole cloud
        pts = (rng.rand(256, 3) * np.array([1.0, 20.0, 20.0])).astype(np.float32)
        anchor = np.floor(pts.min(0) / cell) * cell
        c = np.floor((pts - anchor) / cell).astype(np.int64)
        key = (c[:, 0] << 40) | (c[:, 1] << 20) | c[:, 2]
        s = pts[np.argsort(key, kind="stable")]
        _, overflow = radius_knn_banded(
            jnp.asarray(s), jnp.asarray(s), jnp.int32(256), radius, k,
            cell=cell, band_cap=64, q_count=jnp.int32(256), chunk_size=64,
            return_overflow=True,
        )
        assert int(overflow) > 0

    def test_map_batch_is_result_invariant(self, rng):
        """lax.map batch_size is a pure execution knob: identical indices
        for every batching, banded and unbanded."""
        cell, radius, k = 0.5, 1.0, 8
        s = _xsorted_cloud(rng, 600, np.array([40.0, 4.0, 2.0]), cell)
        q = _xsorted_cloud(rng, 400, np.array([40.0, 4.0, 2.0]), cell)
        base = np.asarray(radius_knn_banded(
            jnp.asarray(q), jnp.asarray(s), jnp.int32(600), radius, k,
            cell=cell, band_cap=256, q_count=jnp.int32(400), chunk_size=64,
        ))
        full = np.asarray(radius_knn(
            jnp.asarray(q), jnp.asarray(s), jnp.int32(600), radius, k,
            chunk_size=64,
        ))
        for mb in (2, 4):
            banded = np.asarray(radius_knn_banded(
                jnp.asarray(q), jnp.asarray(s), jnp.int32(600), radius, k,
                cell=cell, band_cap=256, q_count=jnp.int32(400),
                chunk_size=64, map_batch=mb,
            ))
            np.testing.assert_array_equal(banded, base)
            unbanded = np.asarray(radius_knn(
                jnp.asarray(q), jnp.asarray(s), jnp.int32(600), radius, k,
                chunk_size=64, map_batch=mb,
            ))
            np.testing.assert_array_equal(unbanded, full)

    def test_falls_back_to_full_when_band_covers(self, rng):
        s = _xsorted_cloud(rng, 100, np.array([10.0, 5.0, 2.0]), 0.5)
        a = np.asarray(radius_knn_banded(
            jnp.asarray(s), jnp.asarray(s), jnp.int32(100), 1.0, 5,
            cell=0.5, band_cap=128, q_count=jnp.int32(100),
        ))
        b = np.asarray(radius_knn(jnp.asarray(s), jnp.asarray(s), jnp.int32(100), 1.0, 5))
        np.testing.assert_array_equal(a, b)


class TestPointToNodePartition:
    def test_oracle(self, rng):
        pts = rng.rand(60, 3).astype(np.float32)
        nodes = rng.rand(7, 3).astype(np.float32)
        pmask = np.arange(60) < 50
        nmask = np.arange(7) < 6
        p2n, node_masks, knn_idx, knn_masks = point_to_node_partition(
            jnp.asarray(pts), jnp.asarray(pmask), jnp.asarray(nodes), jnp.asarray(nmask), 16
        )
        p2n, node_masks = np.asarray(p2n), np.asarray(node_masks)
        knn_idx, knn_masks = np.asarray(knn_idx), np.asarray(knn_masks)

        d = ((nodes[:, None] - pts[None]) ** 2).sum(-1)
        d[~nmask] = 1e12
        want_p2n = d[:, :50].argmin(0)
        np.testing.assert_array_equal(p2n[:50], want_p2n)
        # node 6 is invalid -> masked out
        assert not node_masks[6]
        for m in range(6):
            owned = np.where(want_p2n == m)[0]
            assert node_masks[m] == (len(owned) > 0)
            got = knn_idx[m][knn_masks[m]]
            assert set(got) == set(owned[np.argsort(d[m][owned])][:16])
        # sentinel where masked
        assert np.all(knn_idx[~knn_masks] == 60)


class TestProcrustes:
    def test_exact_recovery(self, rng):
        tf = random_transform(rng)
        src = rng.randn(30, 3).astype(np.float32)
        ref = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(tf)))
        est = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref)))
        np.testing.assert_allclose(est, tf, atol=1e-4)

    def test_zero_weight_outliers_ignored(self, rng):
        tf = random_transform(rng)
        src = rng.randn(30, 3).astype(np.float32)
        ref = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(tf)))
        ref_noisy = ref.copy()
        ref_noisy[25:] += 100.0
        w = np.ones(30, np.float32)
        w[25:] = 0.0
        est = np.asarray(
            weighted_procrustes(jnp.asarray(src), jnp.asarray(ref_noisy), jnp.asarray(w))
        )
        np.testing.assert_allclose(est, tf, atol=1e-4)

    def test_batched(self, rng):
        tfs = np.stack([random_transform(rng) for _ in range(5)])
        src = rng.randn(5, 20, 3).astype(np.float32)
        ref = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(tfs)))
        est = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref)))
        np.testing.assert_allclose(est, tfs, atol=1e-4)

    def test_reflection_guard(self):
        # planar degenerate configuration should still return det(R)=+1
        src = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], jnp.float32)
        ref = src.at[:, 0].multiply(-1.0)
        est = np.asarray(weighted_procrustes(src, ref))
        assert np.linalg.det(est[:3, :3]) > 0.99


class TestGreedyNMS:
    def _oracle(self, nodes, mask, radius):
        keep = np.zeros(len(nodes), bool)
        for i in range(len(nodes)):
            if not mask[i]:
                continue
            d = np.linalg.norm(nodes - nodes[i], axis=1)
            # strict <, matching nanoflann's RadiusResultSet (nanoflann.hpp:250)
            neighbors = (d < radius) & mask & keep
            neighbors[i] = False
            keep[i] = not neighbors.any()
        return keep

    def test_matches_sequential_oracle(self, rng):
        nodes = (rng.rand(80, 3) * 5).astype(np.float32)
        mask = rng.rand(80) > 0.2
        got = np.asarray(greedy_nms(jnp.asarray(nodes), jnp.asarray(mask), 1.0))
        want = self._oracle(nodes, mask, 1.0)
        np.testing.assert_array_equal(got, want)

    def test_survivors_are_separated(self, rng):
        nodes = (rng.rand(50, 3) * 3).astype(np.float32)
        mask = np.ones(50, bool)
        keep = np.asarray(greedy_nms(jnp.asarray(nodes), jnp.asarray(mask), 1.0))
        kept = nodes[keep]
        d = np.linalg.norm(kept[:, None] - kept[None], axis=-1)
        np.fill_diagonal(d, 10.0)
        assert d.min() > 1.0

    def test_exact_radius_boundary_not_suppressed(self):
        """Nodes exactly nms_radius apart must BOTH survive: the
        reference adjacency comes from nanoflann, which admits only
        dist < radius (nanoflann.hpp:250)."""
        nodes = np.array([[0.0, 0, 0], [1.0, 0, 0], [0.5, 0, 0]], np.float32)
        mask = np.ones(3, bool)
        keep = np.asarray(greedy_nms(jnp.asarray(nodes), jnp.asarray(mask), 1.0))
        # node 1 is exactly radius from node 0 -> kept; node 2 within -> killed
        assert keep.tolist() == [True, True, False]

    def _truncated_oracle(self, nodes, mask, radius, limit):
        """Reference vote.py:24-39 semantics: each node sees its radius
        neighbors sorted by distance (SELF first at distance 0) truncated
        to `limit`; keep i iff no already-kept node in that list."""
        keep = np.zeros(len(nodes), bool)
        for i in range(len(nodes)):
            if not mask[i]:
                continue
            d = np.linalg.norm(nodes - nodes[i], axis=1)
            within = np.where((d < radius) & mask)[0]
            order = within[np.argsort(d[within], kind="stable")][:limit]
            keep[i] = not keep[order].any()
        return keep

    def test_neighbor_limit_divergence_is_bounded_and_reproduced(self):
        """The exact-vs-reference NMS divergence (ops/nms.py note), pinned:
        in a cluster DENSER than the reference's neighbor limit, a node's
        truncated adjacency misses its farthest within-radius neighbor and
        escapes suppression. neighbor_limit= replicates that truncation."""
        # node 0 kept; nodes 1-4 hug node 0 at ~0.05 (suppressed: node 0
        # stays at the HEAD of their sorted lists). node 5 sits 0.99 from
        # node 0 — its FARTHEST within-radius neighbor — and ~0.94 from
        # nodes 1-4, so its sorted list is [self, 1, 2, 3, 4, 0]; limit=5
        # truncates node 0 away and the reference KEEPS node 5 while the
        # exact adjacency suppresses it.
        nodes = np.array(
            [[0.0, 0, 0], [0.05, 0.01, 0], [0.05, -0.01, 0],
             [0.05, 0, 0.01], [0.05, 0, -0.01], [0.99, 0, 0]], np.float32)
        mask = np.ones(6, bool)
        exact = np.asarray(greedy_nms(jnp.asarray(nodes), jnp.asarray(mask), 1.0))
        trunc = np.asarray(greedy_nms(
            jnp.asarray(nodes), jnp.asarray(mask), 1.0, neighbor_limit=5))
        assert exact.tolist() == [True, False, False, False, False, False]
        assert trunc.tolist() == [True, False, False, False, False, True]
        np.testing.assert_array_equal(
            trunc, self._truncated_oracle(nodes, mask, 1.0, 5))
        # the divergence is one-sided: truncation can only ADD survivors
        assert not np.any(exact & ~trunc)

    def test_neighbor_limit_matches_truncated_oracle_random(self, rng):
        """Truncated mode == the reference-semantics numpy oracle on dense
        random clusters (many nodes exceed the limit), incl. pad rows."""
        nodes = (rng.rand(60, 3) * 2.0).astype(np.float32)  # dense in radius 1
        mask = rng.rand(60) > 0.15
        for limit in (3, 8, 64):
            got = np.asarray(greedy_nms(
                jnp.asarray(nodes), jnp.asarray(mask), 1.0,
                neighbor_limit=limit))
            want = self._truncated_oracle(nodes, mask, 1.0, limit)
            np.testing.assert_array_equal(got, want, err_msg=f"limit={limit}")
        # a limit >= cluster sizes reproduces the exact result
        exact = np.asarray(greedy_nms(jnp.asarray(nodes), jnp.asarray(mask), 1.0))
        np.testing.assert_array_equal(
            np.asarray(greedy_nms(jnp.asarray(nodes), jnp.asarray(mask), 1.0,
                                  neighbor_limit=64)),
            exact,
        )


class TestVoxelSortKey:
    def test_clip_telemetry_on_outlier(self, rng):
        """One far outlier shifts the grid anchor so every real point clips
        out of the 2047-cell x range — the clip count must surface instead
        of the scene silently collapsing into one x-slab."""
        from rdmnet_tpu.ops.grid_subsample import voxel_sort_key

        pts = (rng.rand(100, 3) * 10).astype(np.float32)
        pts[0] = [-1e5, 0, 0]  # sensor glitch
        valid = jnp.ones((100,), bool)
        _, n_clipped = voxel_sort_key(jnp.asarray(pts), valid, 0.3)
        assert int(n_clipped) >= 99

    def test_no_clip_for_normal_scene(self, rng):
        from rdmnet_tpu.ops.grid_subsample import voxel_sort_key

        pts = (rng.rand(100, 3) * 100 - 50).astype(np.float32)
        valid = jnp.arange(100) < 90
        key, n_clipped = voxel_sort_key(jnp.asarray(pts), valid, 0.5)
        assert int(n_clipped) == 0
        k = np.asarray(key)
        assert (k[:90] < np.iinfo(np.int32).max).all()
        assert (k[90:] == np.iinfo(np.int32).max).all()

    def test_corner_cell_key_below_sentinel(self):
        """Max packed key must stay strictly below the invalid sentinel —
        at the old 2047 cx clip a valid corner-cell point got the sentinel
        key and vanished without telemetry."""
        from rdmnet_tpu.ops.grid_subsample import _CLIP

        max_key = (_CLIP[0] << 20) | (_CLIP[1] << 10) | _CLIP[2]
        assert max_key < np.iinfo(np.int32).max

    def test_grid_subsample_reports_clips_in_dropped(self, rng):
        pts = (rng.rand(50, 3) * 5).astype(np.float32)
        pts[0] = [-1e5, 0, 0]
        _, cnt, dropped = grid_subsample(
            jnp.asarray(pts), jnp.int32(50), 0.5, cap=64, return_dropped=True
        )
        assert int(dropped) >= 49
