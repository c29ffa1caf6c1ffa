"""Weighted Procrustes / Kabsch pose solver — batched, native TPU SVD.

Reimplements reference geotransformer/modules/registration/procrustes.py:6-91
(weighted Kabsch with det-sign correction). The reference ships the 3x3
cross-covariance to the CPU for torch.svd (procrustes.py:53); on TPU
``jnp.linalg.svd`` over a (B, 3, 3) batch runs on device — no boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rdmnet_tpu.ops.geometry import (
    EXACT_MATMUL,
    get_transform_from_rotation_translation,
)


def weighted_procrustes(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Rigid transform aligning src -> ref by weighted least squares.

    Args:
      src_points: (..., N, 3)
      ref_points: (..., N, 3)
      weights: (..., N) or None (uniform). Zero-weight rows are ignored, so
        padded correspondences are handled by zero weights.

    Returns:
      (..., 4, 4) transform with R @ src + t ≈ ref.
    """
    if weights is None:
        weights = jnp.ones(src_points.shape[:-1], dtype=src_points.dtype)
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    w = weights[..., None]  # (..., N, 1)

    src_centroid = jnp.sum(src_points * w, axis=-2, keepdims=True)
    ref_centroid = jnp.sum(ref_points * w, axis=-2, keepdims=True)
    src_c = src_points - src_centroid
    ref_c = ref_points - ref_centroid

    # H = src_c^T @ (w * ref_c): (..., 3, 3)
    h = jnp.matmul(
        jnp.swapaxes(src_c, -1, -2),
        w * ref_c,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    u, _, vt = jnp.linalg.svd(h)
    # R = V diag(1,1,sign) U^T with sign = det(V U^T). All 3x3 composition
    # matmuls run at HIGHEST precision (geometry.EXACT_MATMUL policy): the
    # TPU bf16 default would put ~1e-3 relative error straight into the
    # rotation (~0.1 deg — the same order as the RRE accuracy target).
    exact = EXACT_MATMUL
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    sign = jnp.sign(jnp.linalg.det(jnp.matmul(v, ut, **exact)))
    d = jnp.ones(h.shape[:-2] + (3,), dtype=h.dtype)
    d = d.at[..., 2].set(sign)
    r = jnp.matmul(v * d[..., None, :], ut, **exact)

    t = jnp.squeeze(ref_centroid, -2) - jnp.squeeze(
        jnp.matmul(r, jnp.swapaxes(src_centroid, -1, -2), **exact), -1
    )
    return get_transform_from_rotation_translation(r, t)
