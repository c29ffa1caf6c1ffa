"""data/transforms.py vs the reference's transform semantics
(geotransformer/transforms/functional.py:7-162)."""

import numpy as np
import pytest

from rdmnet_tpu.data import transforms as T


@pytest.fixture
def cloud():
    rng = np.random.RandomState(0)
    return (rng.rand(200, 3) * 10.0 - 5.0).astype(np.float64)


def test_normalize_points(cloud):
    out = T.normalize_points(cloud)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-12)
    assert np.isclose(np.linalg.norm(out, axis=1).max(), 1.0)


def test_random_sample_points_wraps_small_clouds(cloud):
    rng = np.random.default_rng(1)
    out = T.random_sample_points(cloud[:7], 20, rng=rng)
    assert out.shape == (20, 3)
    # every output row exists in the input (wrap-around tiling)
    assert all(any(np.array_equal(r, p) for p in cloud[:7]) for r in out)
    out = T.random_sample_points(cloud, 50, rng=rng)
    assert out.shape == (50, 3) and len(np.unique(out, axis=0)) == 50


def test_scale_shift_keeps_unit_normals(cloud):
    rng = np.random.default_rng(2)
    normals = cloud / np.linalg.norm(cloud, axis=1, keepdims=True)
    pts, nrm = T.random_scale_shift_points(cloud, normals=normals, rng=rng)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-12)
    assert pts.shape == cloud.shape


def test_rotate_up_axis_preserves_z_and_norms(cloud):
    rng = np.random.default_rng(3)
    out = T.random_rotate_points_along_up_axis(cloud, rng=rng)
    np.testing.assert_allclose(out[:, 2], cloud[:, 2], atol=1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(out[:, :2], axis=1),
        np.linalg.norm(cloud[:, :2], axis=1), atol=1e-9,
    )


def test_jitter_clipped(cloud):
    rng = np.random.default_rng(4)
    out = T.random_jitter_points(cloud, scale=1.0, noise_magnitude=0.05, rng=rng)
    assert np.abs(out - cloud).max() <= 0.05 + 1e-12


def test_dropout_replaces_with_first_point_and_copies(cloud):
    rng = np.random.default_rng(5)
    before = cloud.copy()
    out = T.random_dropout_points(cloud, max_p=0.95, rng=rng)
    np.testing.assert_array_equal(cloud, before)  # input not mutated
    changed = ~(out == cloud).all(axis=1)
    assert changed.any()
    assert (out[changed] == cloud[0]).all()


def test_crop_with_plane_keeps_positive_side(cloud):
    rng = np.random.default_rng(6)
    normal = np.array([0.0, 0.0, 1.0])
    out = T.random_crop_point_cloud_with_plane(
        cloud, p_normal=normal, keep_ratio=0.5, rng=rng
    )
    assert out.shape[0] == round(0.5 * len(cloud))
    # kept points are exactly the top half by z
    thresh = np.sort(cloud[:, 2])[len(cloud) - out.shape[0]]
    assert out[:, 2].min() >= thresh - 1e-12


def test_crop_with_point_keeps_nearest(cloud):
    rng = np.random.default_rng(7)
    vp = np.array([100.0, 0.0, 0.0])
    out = T.random_crop_point_cloud_with_point(
        cloud, viewpoint=vp, keep_ratio=0.3, rng=rng
    )
    d_kept = np.linalg.norm(vp - out, axis=1).max()
    d_all = np.sort(np.linalg.norm(vp - cloud, axis=1))
    assert d_kept <= d_all[out.shape[0] - 1] + 1e-12


def test_feature_jitter_dtype_and_prob(cloud):
    feats = np.ones((50, 8), np.float32)
    hits = 0
    for seed in range(40):
        out = T.random_jitter_features(feats, rng=np.random.default_rng(seed))
        assert out.dtype == np.float32
        hits += int(not np.array_equal(out, feats))
    assert hits >= 30  # ~0.95 application probability


def test_randomstate_and_generator_both_work(cloud):
    # the reference used global np.random; we accept both RNG families
    for rng in (np.random.RandomState(8), np.random.default_rng(8)):
        out = T.random_dropout_points(cloud, 0.5, rng=rng)
        assert out.shape == cloud.shape
        vp = T.random_sample_viewpoint(rng=rng)
        assert vp.shape == (3,) and (np.abs(vp) > 400).all()
        T.random_jitter_features(np.ones((4, 2), np.float32), rng=rng)
        T.random_shuffle_points(cloud, rng=rng)
        T.random_rescale_points(cloud, rng=rng)
