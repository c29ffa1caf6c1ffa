"""Device-native RANSAC registration: all hypotheses solved in parallel.

The reference's RANSAC baseline is open3d's C++
``registration_ransac_based_on_correspondence`` (50k iterations of 4-point
samples, experiments/eval.py:177-195); our host port (`cli.eval.ransac_np`)
reproduces its semantics with a sequential numpy loop. This module is the
TPU-native solver: hypotheses are drawn, solved (batched weighted Kabsch on
the MXU, `ops/procrustes.py`) and scored against every correspondence in
parallel, in fixed-size chunks folded by `lax.scan` so peak memory stays
bounded at ``chunk x capacity`` residuals regardless of iteration count.

Semantics vs the sequential loop:
* samples are drawn WITH replacement (a duplicate inside one 4-point sample
  merely degrades that hypothesis, which then loses the inlier argmax —
  at realistic correspondence counts the collision rate is <1%);
* ties keep the earliest hypothesis, like the numpy loop's strict `>`;
* the winning hypothesis is refit once on its inliers when at least 3
  exist (same final polish as ransac_np / open3d).

Static-shape ABI: correspondences arrive padded to a capacity with a
validity mask; padded rows never count as inliers and never enter the
refit. `ransac_registration_host` buckets the capacity and caches one
compiled program per (capacity, iterations, samples) shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.ops.geometry import EXACT_MATMUL
from rdmnet_tpu.ops.procrustes import weighted_procrustes


def ransac_registration(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    valid_mask: jnp.ndarray,
    key: jax.Array,
    *,
    num_iterations: int,
    num_samples: int = 4,
    threshold: float | jnp.ndarray = 0.3,
    fallback_weights: jnp.ndarray | None = None,
    chunk: int = 2048,
) -> jnp.ndarray:
    """(4, 4) transform from padded correspondences. Jittable.

    Args:
      src_points / ref_points: (N, 3) padded correspondence endpoints.
      valid_mask: (N,) bool; False rows are padding.
      key: PRNG key (the only source of randomness; deterministic per key).
      num_iterations: hypothesis count (rounded UP to a multiple of chunk).
      num_samples: correspondences per hypothesis (reference num_points=4).
      threshold: inlier distance (traced; changing it does not recompile).
      fallback_weights: optional (N,) weights for the degenerate
        fewer-valid-than-num_samples case, which solves a single weighted
        Procrustes over all valid rows (parity with ransac_np's fallback).
    """
    n_cap = src_points.shape[0]
    n_valid = jnp.sum(valid_mask.astype(jnp.int32))
    thr2 = jnp.asarray(threshold, src_points.dtype) ** 2
    n_chunks = max(1, -(-num_iterations // chunk))

    # index sampling: floor(u * n_valid) over the valid prefix. Clouds are
    # padded suffix-style (valid rows first) by the host wrapper; clamp
    # keeps the n_valid==0 edge in range.
    u = jax.random.uniform(key, (n_chunks, chunk, num_samples))
    idx = jnp.clip(
        (u * n_valid.astype(u.dtype)).astype(jnp.int32), 0, max(n_cap - 1, 0)
    )

    valid_f = valid_mask.astype(src_points.dtype)

    def score_chunk(carry, idx_c):
        best_inl, best_tf = carry
        samp_src = jnp.take(src_points, idx_c, axis=0)  # (chunk, S, 3)
        samp_ref = jnp.take(ref_points, idx_c, axis=0)
        tf = weighted_procrustes(samp_src, samp_ref)  # (chunk, 4, 4)
        r = tf[:, :3, :3]
        t = tf[:, :3, 3]
        moved = (
            jnp.einsum("cij,nj->cni", r, src_points, **EXACT_MATMUL)
            + t[:, None, :]
        )
        res2 = jnp.sum((ref_points[None] - moved) ** 2, axis=-1)  # (chunk, N)
        inl = jnp.sum((res2 < thr2) * valid_f[None], axis=-1)  # (chunk,)
        c = jnp.argmax(inl)
        better = inl[c] > best_inl
        carry = (
            jnp.where(better, inl[c], best_inl),
            jnp.where(better, tf[c], best_tf),
        )
        return carry, None

    init = (jnp.asarray(-1.0, src_points.dtype), jnp.eye(4, dtype=src_points.dtype))
    (_, best_tf), _ = jax.lax.scan(score_chunk, init, idx)

    # final polish: refit on the winning hypothesis's inliers (>= 3)
    r, t = best_tf[:3, :3], best_tf[:3, 3]
    moved = jnp.einsum("ij,nj->ni", r, src_points, **EXACT_MATMUL) + t
    inlier_w = ((jnp.sum((ref_points - moved) ** 2, -1) < thr2)
                * valid_f)
    refit = weighted_procrustes(src_points, ref_points, inlier_w)
    best_tf = jnp.where(jnp.sum(inlier_w) >= 3, refit, best_tf)

    # degenerate input (< num_samples valid rows): single weighted solve,
    # matching ransac_np's fallback
    fw = valid_f if fallback_weights is None else fallback_weights * valid_f
    fallback = weighted_procrustes(src_points, ref_points, fw)
    return jnp.where(n_valid >= num_samples, best_tf, fallback)


@functools.lru_cache(maxsize=32)
def _compiled(cap: int, num_iterations: int, num_samples: int, chunk: int):
    fn = functools.partial(
        ransac_registration,
        num_iterations=num_iterations,
        num_samples=num_samples,
        chunk=chunk,
    )
    return jax.jit(
        lambda s, r, m, k, thr, w: fn(
            s, r, m, k, threshold=thr, fallback_weights=w
        )
    )


def ransac_registration_host(
    src_points: np.ndarray,
    ref_points: np.ndarray,
    weights: np.ndarray | None = None,
    *,
    num_iterations: int = 50000,
    num_samples: int = 4,
    threshold: float = 0.3,
    seed: int = 0,
) -> np.ndarray:
    """numpy-in / numpy-out drop-in for `cli.eval.ransac_np`.

    Pads the correspondence set to a 512-multiple capacity bucket and
    dispatches to one cached compiled program per bucket, so sweeping over
    variable-size dumped pairs does not recompile per pair.
    """
    n = len(src_points)
    cap = max(512, 512 * -(-n // 512))
    chunk = int(min(2048, max(256, (1 << 22) // cap)))
    pad = cap - n
    s = np.pad(src_points.astype(np.float32), ((0, pad), (0, 0)))
    r = np.pad(ref_points.astype(np.float32), ((0, pad), (0, 0)))
    m = np.zeros(cap, bool)
    m[:n] = True
    w = np.ones(cap, np.float32)
    if weights is not None:
        w[:n] = weights.astype(np.float32)
    w[n:] = 0.0
    fn = _compiled(cap, num_iterations, num_samples, chunk)
    tf = fn(s, r, m, jax.random.PRNGKey(seed), np.float32(threshold), w)
    return np.asarray(jax.device_get(tf), dtype=np.float64)
