"""Correspondence toolkit (ops/correspondences.py additions) vs numpy oracles
implementing the reference semantics (matching.py:12-229,369-438,544-660).
Dense masks / fixed-capacity sets must equal the reference's nonzero lists.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rdmnet_tpu.ops import correspondences as C
from rdmnet_tpu.utils.se3_np import euler_zyx_matrix


def _rigid(seed=0):
    rng = np.random.RandomState(seed)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = euler_zyx_matrix(*(0.3 * rng.randn(3))).astype(np.float32)
    t[:3, 3] = rng.randn(3).astype(np.float32)
    return t


def _apply(t, x):
    return x @ t[:3, :3].T + t[:3, 3]


def _oracle_masks_from_scores(score, mutual, bilateral, has_dustbin, threshold):
    p = np.exp(score)
    n, m = p.shape
    row = np.zeros_like(p)
    row[np.arange(n), p.argmax(1)] = p.max(1)
    row_sel = row > threshold
    if mutual or bilateral:
        col = np.zeros_like(p)
        col[p.argmax(0), np.arange(m)] = p.max(0)
        col_sel = col > threshold
        mask = (row_sel & col_sel) if mutual else (row_sel | col_sel)
    else:
        mask = row_sel
    return mask[:-1, :-1] if has_dustbin else mask


@pytest.mark.parametrize(
    "mutual,bilateral,dustbin,thr",
    [(False, False, False, 0.0), (True, False, False, 0.3),
     (False, True, False, 0.3), (True, False, True, 0.0)],
)
def test_masks_from_scores_oracle(mutual, bilateral, dustbin, thr):
    rng = np.random.RandomState(1)
    score = rng.randn(8, 11).astype(np.float32)
    got = np.asarray(C.correspondence_masks_from_scores(
        jnp.asarray(score), mutual=mutual, bilateral=bilateral,
        has_dustbin=dustbin, threshold=thr))
    want = _oracle_masks_from_scores(score, mutual, bilateral, dustbin, thr)
    np.testing.assert_array_equal(got, want)


def test_threshold_masks_oracle():
    rng = np.random.RandomState(2)
    score = rng.randn(6, 7).astype(np.float32)
    got = np.asarray(C.correspondence_masks_threshold(
        jnp.asarray(score), 0.8, has_dustbin=True))
    want = np.exp(score)[:-1, :-1] > 0.8
    np.testing.assert_array_equal(got, want)


def test_top_k_correspondences_oracle():
    rng = np.random.RandomState(3)
    score = rng.randn(6, 7).astype(np.float32)
    ref_i, src_i, valid, vals = C.top_k_correspondences(
        jnp.asarray(score), k=10, has_dustbin=True)
    flat_order = np.argsort(-score.reshape(-1), kind="stable")[:10]
    want = {(int(i) // 7, int(i) % 7) for i in flat_order
            if (i // 7) != 5 and (i % 7) != 6}
    got = {(int(r), int(s)) for r, s, v in
           zip(np.asarray(ref_i), np.asarray(src_i), np.asarray(valid)) if v}
    assert got == want
    np.testing.assert_allclose(
        np.asarray(vals), np.sort(score.reshape(-1))[::-1][:10], rtol=1e-6)
    # smallest selection
    _, _, _, lo = C.top_k_correspondences(jnp.asarray(score), k=3, largest=False)
    np.testing.assert_allclose(
        np.sort(np.asarray(lo)), np.sort(score.reshape(-1))[:3], rtol=1e-6)


def test_feats_masks_mutual_nn():
    rng = np.random.RandomState(4)
    ref = rng.randn(9, 16).astype(np.float32)
    src = rng.randn(12, 16).astype(np.float32)
    mask, sq = C.correspondence_masks_from_feats(
        jnp.asarray(ref), jnp.asarray(src), mutual=True)
    d = ((ref[:, None] - src[None]) ** 2).sum(-1)
    want = np.zeros_like(d, bool)
    for i in range(9):
        j = d[i].argmin()
        if d[:, j].argmin() == i:
            want[i, j] = True
    np.testing.assert_array_equal(np.asarray(mask), want)
    np.testing.assert_allclose(np.asarray(sq), d, rtol=1e-4, atol=1e-4)


def test_dense_to_node_counts_and_scores():
    rng = np.random.RandomState(5)
    ref_pts = rng.rand(40, 3).astype(np.float32) * 10
    src_pts = rng.rand(35, 3).astype(np.float32) * 10
    ref_nodes = rng.rand(5, 3).astype(np.float32) * 10
    src_nodes = rng.rand(4, 3).astype(np.float32) * 10
    corr = np.stack([rng.randint(0, 40, 25), rng.randint(0, 35, 25)], 1)
    counts, scores = C.dense_to_node_correspondences(
        jnp.asarray(ref_pts), jnp.asarray(src_pts),
        jnp.asarray(ref_nodes), jnp.asarray(src_nodes), jnp.asarray(corr))
    # oracle (reference matching.py:211-227)
    r2n = ((ref_pts[:, None] - ref_nodes[None]) ** 2).sum(-1).argmin(1)
    s2n = ((src_pts[:, None] - src_nodes[None]) ** 2).sum(-1).argmin(1)
    want = np.zeros((5, 4), np.int32)
    for a, b in corr:
        want[r2n[a], s2n[b]] += 1
    np.testing.assert_array_equal(np.asarray(counts), want)
    rs = np.bincount(r2n, minlength=5)
    ss = np.bincount(s2n, minlength=4)
    w = 0.5 * (want / np.maximum(rs, 1)[:, None] + want / np.maximum(ss, 1)[None, :])
    np.testing.assert_allclose(np.asarray(scores), w, rtol=1e-5, atol=1e-6)
    # padded correspondences drop out
    corr_pad = np.concatenate([corr, [[40, 0], [0, 35]]])
    mask = np.array([True] * 25 + [False, False])
    counts2, _ = C.dense_to_node_correspondences(
        jnp.asarray(ref_pts), jnp.asarray(src_pts),
        jnp.asarray(ref_nodes), jnp.asarray(src_nodes),
        jnp.asarray(corr_pad), corr_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(counts2), want)


def _patch_setup(seed=6, m=4, n=3, k=5, npts=30):
    rng = np.random.RandomState(seed)
    ref_pts = rng.rand(npts, 3).astype(np.float32) * 4
    t = _rigid(seed)
    src_pts = _apply(np.linalg.inv(t), ref_pts[rng.permutation(npts)]).astype(np.float32)
    rki = rng.randint(0, npts, (m, k))
    ski = rng.randint(0, npts, (n, k))
    rkm = rng.rand(m, k) > 0.2
    skm = rng.rand(n, k) > 0.2
    rkp = ref_pts[rki]
    skp = src_pts[ski]
    node_corr = np.stack([rng.randint(0, m, 6), rng.randint(0, n, 6)], 1)
    return ref_pts, src_pts, rkp, skp, rki, ski, rkm, skm, node_corr, t


def test_node_to_dense_matches_nonzero_oracle():
    ref_pts, src_pts, rkp, skp, rki, ski, rkm, skm, node_corr, t = _patch_setup()
    radius = 0.8
    corr, ref_idx, src_idx, dist = C.node_to_dense_correspondences(
        jnp.asarray(rkp), jnp.asarray(skp), jnp.asarray(rki), jnp.asarray(ski),
        jnp.asarray(node_corr), jnp.asarray(t), radius,
        ref_knn_masks=jnp.asarray(rkm), src_knn_masks=jnp.asarray(skm))
    got = {(int(ref_idx[p, i]), int(src_idx[p, j]))
           for p, i, j in zip(*np.nonzero(np.asarray(corr)))}
    # oracle (reference matching.py:544-584)
    skp_t = _apply(t, skp.reshape(-1, 3)).reshape(skp.shape)
    want = set()
    for p, (a, b) in enumerate(node_corr):
        d = np.linalg.norm(rkp[a][:, None] - skp_t[b][None], axis=-1)
        ok = (d < radius) & rkm[a][:, None] & skm[b][None, :]
        for i, j in zip(*np.nonzero(ok)):
            want.add((int(rki[a, i]), int(ski[b, j])))
    assert got == want and len(want) > 0


def test_node_pair_overlaps_oracle():
    _, _, rkp, skp, _, _, rkm, skm, _, t = _patch_setup(seed=7, m=3, n=3)
    radius = 1.0
    got = np.asarray(C.node_pair_overlaps(
        jnp.asarray(rkp), jnp.asarray(skp), jnp.asarray(t), radius,
        jnp.asarray(rkm), jnp.asarray(skm)))
    skp_t = _apply(t, skp.reshape(-1, 3)).reshape(skp.shape)
    for b in range(3):
        d = np.linalg.norm(rkp[b][:, None] - skp_t[b][None], axis=-1)
        hit = (d < radius) & rkm[b][:, None] & skm[b][None, :]
        r = hit.any(1).sum() / rkm[b].sum()
        s = hit.any(0).sum() / skm[b].sum()
        np.testing.assert_allclose(got[b], 0.5 * (r + s), rtol=1e-5)


def test_node_overlap_and_occlusion_ratios():
    ref_pts, src_pts, rkp, skp, rki, ski, rkm, skm, node_corr, t = _patch_setup(seed=8)
    radius = 0.9
    args = (len(ref_pts), len(src_pts), jnp.asarray(rkp), jnp.asarray(skp),
            jnp.asarray(rki), jnp.asarray(ski), jnp.asarray(node_corr),
            jnp.asarray(t), radius, jnp.asarray(rkm), jnp.asarray(skm))
    ro, so = C.node_overlap_ratios(*args)
    rocc, socc = C.node_occlusion_ratios(*args)
    np.testing.assert_allclose(np.asarray(rocc), 1.0 - np.asarray(ro), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(socc), 1.0 - np.asarray(so), rtol=1e-6)
    # oracle: a point is overlapping if it appears in any dense corr; NOTE
    # the reference passes ref masks for BOTH sides (matching.py:611)
    skp_t = _apply(t, skp.reshape(-1, 3)).reshape(skp.shape)
    ref_flag = np.zeros(len(ref_pts) + 1)
    src_flag = np.zeros(len(src_pts) + 1)
    for a, b in node_corr:
        d = np.linalg.norm(rkp[a][:, None] - skp_t[b][None], axis=-1)
        ok = (d < radius) & rkm[a][:, None] & rkm[b][None, :]
        ref_flag[rki[a][ok.any(1)]] = 1
        src_flag[ski[b][ok.any(0)]] = 1
    want_r = (ref_flag[rki] * rkm).sum(1) / (rkm.sum(1) + 1e-5)
    want_s = (src_flag[ski] * skm).sum(1) / (skm.sum(1) + 1e-5)
    np.testing.assert_allclose(np.asarray(ro), want_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(so), want_s, rtol=1e-5, atol=1e-6)
