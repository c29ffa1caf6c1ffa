"""Ground-truth correspondence generation (dense, static-shape, on device).

Re-design of reference geotransformer/modules/registration/matching.py:

* ``node_correspondence_overlaps`` (reference get_node_correspondences,
  matching.py:251-366) returns a dense (M, N) overlap matrix. The reference's
  dynamic candidate list (sphere-intersection nonzero) becomes a static
  top-C candidate selection + chunked overlap computation;
* ``mutual_nearest_node_masks`` (reference get_node_correspondences_disance,
  matching.py:440-504) — mutual-NN masks for the vote loss;
* ``radius_correspondence_masks`` — per-point "has a partner within radius"
  labels, replacing the CPU scipy cKDTree round-trip in the reference's
  overlap losses (reference experiments/loss.py:92,151 →
  geotransformer/utils/registration.py:203-216).

Plus the reference's correspondence *toolkit* (exported from
geotransformer/modules/registration/__init__.py, used by the GeoTransformer
family's ablations/analysis): score/feature-based extraction, dense↔node
conversions, and per-node overlap/occlusion ratios. The reference returns
dynamic ``torch.nonzero`` lists; here every selection is a dense boolean
mask or a fixed-capacity set with a validity mask (the framework's static-
shape ABI) whose True set provably equals the reference's nonzero list.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rdmnet_tpu.ops.geometry import apply_transform, pairwise_sq_dist

_BIG = 1.0e12


def node_correspondence_overlaps(
    ref_nodes: jnp.ndarray,
    src_nodes: jnp.ndarray,
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    transform: jnp.ndarray,
    pos_radius: float,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    num_candidates: int = 3072,
    chunk: int = 256,
) -> jnp.ndarray:
    """Dense GT patch-overlap matrix (M, N).

    overlap(i, j) = mean of (fraction of patch-i points with a patch-j point
    within pos_radius, and vice versa), computed only for candidate pairs
    whose enclosing spheres intersect (reference matching.py:311-342).
    """
    m, k, _ = ref_knn_points.shape
    n = src_nodes.shape[0]

    src_nodes_t = apply_transform(src_nodes, transform)
    src_knn_t = apply_transform(src_knn_points.reshape(-1, 3), transform).reshape(n, k, 3)

    # enclosing-sphere radii (masked knn dists)
    ref_d = jnp.linalg.norm(ref_knn_points - ref_nodes[:, None, :], axis=-1)
    ref_rmax = jnp.max(jnp.where(ref_knn_masks, ref_d, 0.0), axis=1)  # (M,)
    src_d = jnp.linalg.norm(src_knn_t - src_nodes_t[:, None, :], axis=-1)
    src_rmax = jnp.max(jnp.where(src_knn_masks, src_d, 0.0), axis=1)  # (N,)

    node_dist = jnp.sqrt(pairwise_sq_dist(ref_nodes, src_nodes_t))
    margin = ref_rmax[:, None] + src_rmax[None, :] + pos_radius - node_dist
    pair_mask = (margin > 0) & ref_masks[:, None] & src_masks[None, :]

    # static candidate set: top-C pairs by margin. approx_max_k instead of
    # top_k: XLA:TPU's exact windowed top-k emitter SIGABRTs on vmapped
    # f32[1, M*N] operands; near-threshold candidates dropped by the 0.98
    # recall have ~zero overlap anyway.
    num_candidates = min(num_candidates, m * n)
    flat = jnp.where(pair_mask, margin, -_BIG).reshape(-1)
    if num_candidates == m * n:
        top_vals, cand = jax.lax.top_k(flat, num_candidates)
    else:
        top_vals, cand = jax.lax.approx_max_k(
            flat, num_candidates, recall_target=0.98
        )
    cand_valid = top_vals > -_BIG / 2
    cand_ref = (cand // n).astype(jnp.int32)
    cand_src = (cand % n).astype(jnp.int32)

    def pair_overlap(args):
        ri, si, ok = args
        rp = ref_knn_points[ri]        # (K, 3)
        sp = src_knn_t[si]             # (K, 3)
        rm = ref_knn_masks[ri]
        sm = src_knn_masks[si]
        d2 = pairwise_sq_dist(rp, sp)
        d2 = jnp.where(rm[:, None] & sm[None, :], d2, _BIG)
        hit = d2 < pos_radius**2
        ref_cov = jnp.sum(jnp.any(hit, axis=1).astype(jnp.float32))
        src_cov = jnp.sum(jnp.any(hit, axis=0).astype(jnp.float32))
        ref_ov = ref_cov / jnp.maximum(jnp.sum(rm.astype(jnp.float32)), 1.0)
        src_ov = src_cov / jnp.maximum(jnp.sum(sm.astype(jnp.float32)), 1.0)
        return jnp.where(ok, 0.5 * (ref_ov + src_ov), 0.0)

    # chunked vmap over candidates to bound memory (chunk*K*K floats)
    num_chunks = -(-num_candidates // chunk)
    pad = num_chunks * chunk - num_candidates
    cr = jnp.pad(cand_ref, (0, pad)).reshape(num_chunks, chunk)
    cs = jnp.pad(cand_src, (0, pad)).reshape(num_chunks, chunk)
    cv = jnp.pad(cand_valid, (0, pad)).reshape(num_chunks, chunk)
    overlaps = jax.lax.map(jax.vmap(pair_overlap), (cr, cs, cv)).reshape(-1)[
        :num_candidates
    ]

    dense = jnp.zeros((m, n), jnp.float32)
    dense = dense.at[cand_ref, cand_src].max(
        jnp.where(cand_valid, overlaps, 0.0), mode="drop"
    )
    return dense


def mutual_nearest_node_masks(
    ref_nodes: jnp.ndarray,
    src_nodes: jnp.ndarray,
    transform: jnp.ndarray,
    pos_radius: float,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
) -> jnp.ndarray:
    """(M, N) bool: each side's nearest neighbor within pos_radius
    (reference get_node_correspondences_disance, matching.py:470-504).
    NOTE: the reference compares *squared* distance against the unsquared
    radius (matching.py:488-494) — reproduced bug-for-bug so the vote loss
    sees identical labels.
    """
    m, n = ref_nodes.shape[0], src_nodes.shape[0]
    src_t = apply_transform(src_nodes, transform)
    sq = pairwise_sq_dist(ref_nodes, src_t)
    sq = jnp.where(ref_masks[:, None] & src_masks[None, :], sq, _BIG)

    masks = jnp.zeros((m, n), bool)
    ref_min = jnp.min(sq, axis=1)
    ref_arg = jnp.argmin(sq, axis=1)
    masks = masks.at[jnp.arange(m), ref_arg].set(ref_min < pos_radius)
    src_min = jnp.min(sq, axis=0)
    src_arg = jnp.argmin(sq, axis=0)
    cur = masks[src_arg, jnp.arange(n)]
    masks = masks.at[src_arg, jnp.arange(n)].set(cur | (src_min < pos_radius))
    return masks & ref_masks[:, None] & src_masks[None, :]


def radius_correspondence_masks(
    ref_points: jnp.ndarray,
    src_points_t: jnp.ndarray,
    ref_mask: jnp.ndarray,
    src_mask: jnp.ndarray,
    radius: float,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point overlap labels: True iff some valid point of the other
    (already transformed) cloud lies within ``radius``. On-device
    replacement for the reference's scipy cKDTree correspondence labels
    (experiments/loss.py:92,151)."""

    def min_dist_rows(q_tile, s_points, s_valid):
        d2 = pairwise_sq_dist(q_tile, s_points)
        d2 = jnp.where(s_valid[None, :], d2, _BIG)
        return jnp.min(d2, axis=1)

    def chunked_min(q, s, s_valid):
        nq = q.shape[0]
        num_chunks = -(-nq // chunk)
        padq = jnp.pad(q, ((0, num_chunks * chunk - nq), (0, 0)))
        tiles = padq.reshape(num_chunks, chunk, 3)
        mins = jax.lax.map(functools.partial(min_dist_rows, s_points=s, s_valid=s_valid), tiles)
        return mins.reshape(-1)[:nq]

    r2 = radius * radius
    ref_min = chunked_min(ref_points, src_points_t, src_mask)
    src_min = chunked_min(src_points_t, ref_points, ref_mask)
    return (ref_min < r2) & ref_mask, (src_min < r2) & src_mask


# --------------------------------------------------------------------------
# Correspondence toolkit (reference matching.py:12-229,369-438,544-660 +
# utils/registration.py:258). Dense-mask / fixed-capacity redesigns.
# --------------------------------------------------------------------------


def correspondence_masks_from_scores(
    score_mat: jnp.ndarray,
    mutual: bool = False,
    bilateral: bool = False,
    has_dustbin: bool = False,
    threshold: float = 0.0,
) -> jnp.ndarray:
    """(N, M) bool selection mask from log matching probabilities
    (reference extract_correspondences_from_scores, matching.py:12-67).

    Selection: each row's argmax column where exp(score) > threshold;
    ``mutual`` intersects with the column-argmax set, ``bilateral`` unions.
    The reference's (C,) nonzero index lists are exactly the True set here
    (argmax == torch.max index, first-hit tie rule preserved).
    """
    probs = jnp.exp(score_mat)
    n, m = probs.shape
    row_sel = jnp.zeros((n, m), bool).at[
        jnp.arange(n), jnp.argmax(probs, axis=1)
    ].set(jnp.max(probs, axis=1) > threshold)
    if mutual or bilateral:
        col_sel = jnp.zeros((n, m), bool).at[
            jnp.argmax(probs, axis=0), jnp.arange(m)
        ].set(jnp.max(probs, axis=0) > threshold)
        mask = (row_sel & col_sel) if mutual else (row_sel | col_sel)
    else:
        mask = row_sel
    if has_dustbin:
        mask = mask[:-1, :-1]
    return mask


def correspondence_masks_threshold(
    score_mat: jnp.ndarray, threshold: float, has_dustbin: bool = False
) -> jnp.ndarray:
    """(N, M) bool mask: exp(score) > threshold (reference
    extract_correspondences_from_scores_threshold, matching.py:71-98)."""
    probs = jnp.exp(score_mat)
    if has_dustbin:
        probs = probs[:-1, :-1]
    return probs > threshold


def top_k_correspondences(
    score_mat: jnp.ndarray, k: int, has_dustbin: bool = False, largest: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Global top-k cells of the score matrix as a fixed-capacity set:
    (k,) ref indices, (k,) src indices, (k,) valid, (k,) scores
    (reference extract_correspondences_from_scores_topk,
    matching.py:101-133). The reference drops dustbin hits (dynamic
    shape); here they are masked invalid instead.
    """
    n, m = score_mat.shape
    flat = score_mat.reshape(-1)
    _, idx = jax.lax.top_k(flat if largest else -flat, k)
    ref_idx = (idx // m).astype(jnp.int32)
    src_idx = (idx % m).astype(jnp.int32)
    valid = jnp.ones((k,), bool)
    if has_dustbin:
        valid = (ref_idx != n - 1) & (src_idx != m - 1)
    return ref_idx, src_idx, valid, flat[idx]


def correspondence_masks_from_feats(
    ref_feats: jnp.ndarray,
    src_feats: jnp.ndarray,
    mutual: bool = False,
    bilateral: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-neighbor feature matching: (N, M) selection mask + the
    squared feature-distance matrix (reference
    extract_correspondences_from_feats, matching.py:136-173)."""
    sq = pairwise_sq_dist(ref_feats, src_feats)
    # exp(-d^2) > 0 always, so threshold 0 keeps every row/col argmax —
    # same behavior as the reference's exp(-dist) against threshold 0
    mask = correspondence_masks_from_scores(
        -sq, mutual=mutual, bilateral=bilateral, has_dustbin=False, threshold=0.0
    )
    return mask, sq


def nearest_node_assignment(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    point_masks: Optional[jnp.ndarray] = None,
    node_masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Each point's nearest node index + per-node point counts (reference
    get_point_to_node_indices via dense_correspondences_to_node_
    correspondences, matching.py:211-212). Pad points get the sentinel
    index ``len(nodes)`` and count toward no node."""
    big = jnp.asarray(_BIG, jnp.float32)
    sq = pairwise_sq_dist(points, nodes)
    if node_masks is not None:
        sq = jnp.where(node_masks[None, :], sq, big)
    idx = jnp.argmin(sq, axis=1).astype(jnp.int32)
    if point_masks is not None:
        idx = jnp.where(point_masks, idx, nodes.shape[0])
    sizes = jnp.zeros((nodes.shape[0],), jnp.int32).at[idx].add(1, mode="drop")
    return idx, sizes


def dense_to_node_correspondences(
    ref_points: jnp.ndarray,
    src_points: jnp.ndarray,
    ref_nodes: jnp.ndarray,
    src_nodes: jnp.ndarray,
    corr_indices: jnp.ndarray,
    corr_mask: Optional[jnp.ndarray] = None,
    ref_point_masks: Optional[jnp.ndarray] = None,
    src_point_masks: Optional[jnp.ndarray] = None,
    ref_node_masks: Optional[jnp.ndarray] = None,
    src_node_masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Point correspondences -> dense (M, N) node-correspondence count
    matrix + proxy overlap scores (reference
    dense_correspondences_to_node_correspondences, matching.py:177-229).

    The reference's unique node-pair list with counts is the nonzero set of
    the count matrix; score(i,j) = (c/|patch_i| + c/|patch_j|) / 2.
    ``corr_indices`` is (C, 2) [ref, src] rows, optionally padded with
    ``corr_mask``.
    """
    ref_p2n, ref_sizes = nearest_node_assignment(
        ref_points, ref_nodes, ref_point_masks, ref_node_masks
    )
    src_p2n, src_sizes = nearest_node_assignment(
        src_points, src_nodes, src_point_masks, src_node_masks
    )
    m, n = ref_nodes.shape[0], src_nodes.shape[0]
    weights = (
        corr_mask.astype(jnp.int32)
        if corr_mask is not None
        else jnp.ones((corr_indices.shape[0],), jnp.int32)
    )
    ri = jnp.take(ref_p2n, corr_indices[:, 0], mode="fill", fill_value=m)
    si = jnp.take(src_p2n, corr_indices[:, 1], mode="fill", fill_value=n)
    counts = jnp.zeros((m, n), jnp.int32).at[ri, si].add(weights, mode="drop")
    cf = counts.astype(jnp.float32)
    scores = 0.5 * (
        cf / jnp.maximum(ref_sizes, 1)[:, None].astype(jnp.float32)
        + cf / jnp.maximum(src_sizes, 1)[None, :].astype(jnp.float32)
    )
    return counts, scores


def node_to_dense_correspondences(
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    ref_knn_indices: jnp.ndarray,
    src_knn_indices: jnp.ndarray,
    node_corr_indices: jnp.ndarray,
    transform: jnp.ndarray,
    matching_radius: float,
    node_corr_mask: Optional[jnp.ndarray] = None,
    ref_knn_masks: Optional[jnp.ndarray] = None,
    src_knn_masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Node correspondences -> dense point-correspondence tensor.

    Returns ``(corr, ref_idx, src_idx, dist)`` where ``corr`` is (P, K, K)
    bool over the P selected node pairs and ``ref_idx``/``src_idx`` are the
    (P, K) point-index tables; the reference's (C, 2) nonzero list
    (node_correspondences_to_dense_correspondences, matching.py:544-584)
    is exactly ``{(ref_idx[p,i], src_idx[p,j]) : corr[p,i,j]}``.
    """
    src_t = apply_transform(
        src_knn_points.reshape(-1, 3), transform
    ).reshape(src_knn_points.shape)
    ri = node_corr_indices[:, 0]
    si = node_corr_indices[:, 1]
    rkp = jnp.take(ref_knn_points, ri, axis=0, mode="clip")
    skp = jnp.take(src_t, si, axis=0, mode="clip")
    ref_idx = jnp.take(ref_knn_indices, ri, axis=0, mode="clip")
    src_idx = jnp.take(src_knn_indices, si, axis=0, mode="clip")
    dist = jnp.sqrt(pairwise_sq_dist(rkp, skp))  # (P, K, K)
    corr = dist < matching_radius
    if ref_knn_masks is not None:
        rkm = jnp.take(ref_knn_masks, ri, axis=0, mode="clip")
        corr = corr & rkm[:, :, None]
    if src_knn_masks is not None:
        skm = jnp.take(src_knn_masks, si, axis=0, mode="clip")
        corr = corr & skm[:, None, :]
    if node_corr_mask is not None:
        corr = corr & node_corr_mask[:, None, None]
    return corr, ref_idx, src_idx, dist


def node_pair_overlaps(
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    transform: jnp.ndarray,
    pos_radius: float,
    ref_knn_masks: Optional[jnp.ndarray] = None,
    src_knn_masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B,) symmetric patch-overlap fraction for ALIGNED patch pairs
    (reference get_node_overlap, matching.py:369-438): mean of the two
    sides' fractions of points with a partner within pos_radius."""
    src_t = apply_transform(
        src_knn_points.reshape(-1, 3), transform
    ).reshape(src_knn_points.shape)
    if ref_knn_masks is None:
        ref_knn_masks = jnp.ones(ref_knn_points.shape[:2], bool)
    if src_knn_masks is None:
        src_knn_masks = jnp.ones(src_knn_points.shape[:2], bool)
    sq = pairwise_sq_dist(ref_knn_points, src_t)  # (B, K, K)
    hit = (sq < pos_radius**2) & ref_knn_masks[:, :, None] & src_knn_masks[:, None, :]
    f32 = jnp.float32
    ref_cov = jnp.sum(jnp.any(hit, axis=2).astype(f32), axis=1)
    src_cov = jnp.sum(jnp.any(hit, axis=1).astype(f32), axis=1)
    ref_ov = ref_cov / jnp.sum(ref_knn_masks.astype(f32), axis=1)
    src_ov = src_cov / jnp.sum(src_knn_masks.astype(f32), axis=1)
    return 0.5 * (ref_ov + src_ov)


def node_overlap_ratios(
    num_ref_points: int,
    num_src_points: int,
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    ref_knn_indices: jnp.ndarray,
    src_knn_indices: jnp.ndarray,
    node_corr_indices: jnp.ndarray,
    transform: jnp.ndarray,
    matching_radius: float,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    node_corr_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-node fraction of its patch points participating in any dense GT
    correspondence (reference get_node_overlap_ratios, matching.py:586-623;
    occlusion ratios are 1 - these, matching.py:625-660).

    NOTE the reference passes ``ref_knn_masks`` for BOTH sides when
    building the dense correspondences (matching.py:603-613) — reproduced
    here so the ratios match it exactly.
    """
    corr, ref_idx, src_idx, _ = node_to_dense_correspondences(
        ref_knn_points,
        src_knn_points,
        ref_knn_indices,
        src_knn_indices,
        node_corr_indices,
        transform,
        matching_radius,
        node_corr_mask=node_corr_mask,
        ref_knn_masks=ref_knn_masks,
        src_knn_masks=ref_knn_masks,  # sic — reference matching.py:611
    )
    f32 = jnp.float32
    ref_flags = jnp.zeros((num_ref_points + 1,), f32).at[ref_idx.reshape(-1)].max(
        jnp.any(corr, axis=2).reshape(-1).astype(f32), mode="drop"
    )
    src_flags = jnp.zeros((num_src_points + 1,), f32).at[src_idx.reshape(-1)].max(
        jnp.any(corr, axis=1).reshape(-1).astype(f32), mode="drop"
    )
    ref_knn_flags = jnp.take(ref_flags, ref_knn_indices, mode="clip")
    src_knn_flags = jnp.take(src_flags, src_knn_indices, mode="clip")
    rkm = ref_knn_masks.astype(f32)
    skm = src_knn_masks.astype(f32)
    ref_ratios = jnp.sum(ref_knn_flags * rkm, axis=1) / (jnp.sum(rkm, axis=1) + eps)
    src_ratios = jnp.sum(src_knn_flags * skm, axis=1) / (jnp.sum(skm, axis=1) + eps)
    return ref_ratios, src_ratios


def node_occlusion_ratios(*args, **kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1 - overlap ratios (reference get_node_occlusion_ratios,
    matching.py:625-660)."""
    ref_ratios, src_ratios = node_overlap_ratios(*args, **kwargs)
    return 1.0 - ref_ratios, 1.0 - src_ratios
