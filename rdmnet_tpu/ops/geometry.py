"""Core geometric tensor ops (SE(3) kit, distances, padded gathers).

Functional equivalents of the reference's L1 op layer
(reference: geotransformer/modules/ops/{pairwise_distance,transformation,
index_select,vector_angle}.py) expressed as pure jnp functions over static
shapes. All functions are unbatched ("one cloud"); batch with jax.vmap.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pairwise_sq_dist(x: jnp.ndarray, y: jnp.ndarray, normalized: bool = False) -> jnp.ndarray:
    """Squared euclidean distance matrix between rows of x (*, N, C) and y (*, M, C).

    Matches reference pairwise_distance semantics
    (geotransformer/modules/ops/pairwise_distance.py:84-130): if
    ``normalized`` the rows are unit-norm and the fast path ``2 - 2 x·y`` is
    used. Result is clamped at zero for numerical safety. Uses a single
    MXU-friendly matmul.
    """
    # HIGHEST precision: geometric distances drive neighbor selection and GT
    # correspondences; TPU default (bf16 inputs) flips orderings. The inner
    # dim is tiny (3 for points), so this costs nothing.
    xy = jnp.matmul(
        x,
        jnp.swapaxes(y, -1, -2),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if normalized:
        sq = 2.0 - 2.0 * xy
    else:
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        y2 = jnp.sum(y * y, axis=-1, keepdims=True)
        sq = x2 - 2.0 * xy + jnp.swapaxes(y2, -1, -2)
    return jnp.maximum(sq, 0.0)


def take_padded(
    x: jnp.ndarray,
    indices: jnp.ndarray,
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Gather rows of ``x`` with sentinel-index padding support.

    The framework-wide masking ABI: an index equal to (or beyond) ``x.shape[0]``
    means "missing" and yields ``fill_value`` rows. This replaces the
    reference pattern of concatenating one zero/inf row then index_select
    (e.g. geotransformer/modules/kpconv/kpconv.py:91,103).
    """
    return jnp.take(x, indices, axis=0, mode="fill", fill_value=fill_value)


def get_transform_from_rotation_translation(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Compose (*, 3, 3) + (*, 3) -> (*, 4, 4)."""
    batch_shape = rotation.shape[:-2]
    transform = jnp.zeros(batch_shape + (4, 4), dtype=rotation.dtype)
    transform = transform.at[..., :3, :3].set(rotation)
    transform = transform.at[..., :3, 3].set(translation)
    transform = transform.at[..., 3, 3].set(1.0)
    return transform


def get_rotation_translation_from_transform(transform: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return transform[..., :3, :3], transform[..., :3, 3]


# SE(3) math always runs at HIGHEST matmul precision: the TPU default
# (single-pass bf16 inputs) costs ~1e-3 relative error, which at LiDAR
# coordinate scale (~80 m) is centimeter-level position error and ~0.1 deg
# rotation error — the same order as the accuracy targets (RRE 0.18 deg /
# RTE 5.3 cm). These matmuls have inner dim 3, so exactness is free.
# (Shared policy constant — ops/procrustes.py imports it for the rotation
# composition; keep the policy in one place.)
EXACT_MATMUL = dict(
    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
)
_EXACT = EXACT_MATMUL


def apply_transform(points: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) transform(s) to points.

    Supports (*, 3) points with a single (4, 4) transform, or batched
    (B, N, 3) with (B, 4, 4) (reference:
    geotransformer/modules/ops/transformation.py:7-60).
    """
    rotation = transform[..., :3, :3]
    translation = transform[..., :3, 3]
    if transform.ndim == 2:
        return jnp.matmul(points, rotation.T, **_EXACT) + translation
    # batched: points (B, N, 3), transform (B, 4, 4)
    return (
        jnp.matmul(points, jnp.swapaxes(rotation, -1, -2), **_EXACT)
        + translation[..., None, :]
    )


def apply_rotation(points: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    if rotation.ndim == 2:
        return jnp.matmul(points, rotation.T, **_EXACT)
    return jnp.matmul(points, jnp.swapaxes(rotation, -1, -2), **_EXACT)


def inverse_transform(transform: jnp.ndarray) -> jnp.ndarray:
    """Invert (*, 4, 4) rigid transform(s)."""
    rotation, translation = get_rotation_translation_from_transform(transform)
    inv_rotation = jnp.swapaxes(rotation, -1, -2)
    inv_translation = -jnp.squeeze(
        jnp.matmul(inv_rotation, translation[..., None], **_EXACT), axis=-1
    )
    return get_transform_from_rotation_translation(inv_rotation, inv_translation)


def skew_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """(*, 3) -> (*, 3, 3) cross-product matrix."""
    zeros = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rodrigues_rotation(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle to rotation matrix (reference: ops/transformation.py Rodrigues)."""
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    k = skew_symmetric(axis)
    eye = jnp.eye(3, dtype=axis.dtype)
    sin = jnp.sin(angle)[..., None, None]
    cos = jnp.cos(angle)[..., None, None]
    return eye + sin * k + (1.0 - cos) * jnp.matmul(k, k, **_EXACT)


def vector_angle(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Angle between vectors via atan2(|x×y|, x·y)
    (reference: geotransformer/modules/ops/vector_angle.py:147-164)."""
    cross = jnp.linalg.norm(jnp.cross(x, y), axis=-1)
    dot = jnp.sum(x * y, axis=-1)
    return jnp.arctan2(cross, dot)


def masked_min(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    axis: int,
    big: float = 1e12,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """min + argmin along ``axis`` treating ``mask==False`` entries as +big."""
    masked = jnp.where(mask, values, big)
    return jnp.min(masked, axis=axis), jnp.argmin(masked, axis=axis)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-12) -> jnp.ndarray:
    """Mean over entries where ``mask`` is True."""
    mask = mask.astype(values.dtype)
    total = jnp.sum(values * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, eps)
