"""Kernel point dispositions for KPConv.

The reference optimizes kernel point positions by repulsion and caches them
as a .ply asset (reference: geotransformer/modules/kpconv/kernel_points.py:
62-455, asset dispositions/k_015_center_3D.ply). We embed the canonical
15-point 'center' disposition (unit scale, mean non-center radius ~0.661)
as data and apply the same load-time processing (optional random z-rotation
+ 0.01 jitter, then scaling by the conv radius,
reference: kernel_points.py:426-455) with an explicit PRNG key.

For kernel sizes other than 15 we run a small fixed-seed repulsion
optimization (Lloyd-style) at init time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Canonical K=15 'center' disposition (unit scale). Data asset, identical in
# value to the reference's shipped k_015_center_3D.ply.
KERNEL_POINTS_15 = np.array(
    [
        [0.0, 0.0, 0.0],
        [-0.49820612, 0.41826797, 0.11736718],
        [-0.24123565, -0.34214048, -0.5115481],
        [-0.2828808, -0.58614266, 0.11553228],
        [0.29054036, -0.10093209, -0.585091],
        [0.42820039, 0.39929883, -0.30681813],
        [-0.63586493, -0.08196441, -0.16090403],
        [-0.43181082, -0.14729417, 0.47830957],
        [-0.044666, 0.27973214, 0.59723308],
        [0.22552417, -0.34462544, 0.50794659],
        [0.63889212, -0.16914906, -0.01190108],
        [-0.22552415, 0.34462545, -0.50794659],
        [0.49054666, 0.26880703, 0.35219206],
        [0.25233084, -0.59706653, -0.12951142],
        [0.03415394, 0.65858341, 0.04513958],
    ],
    dtype=np.float32,
)


def _repulsion_dispositions(num_points: int, seed: int = 7351, steps: int = 200) -> np.ndarray:
    """Fixed-seed repulsion optimization of `num_points` kernel points in the
    unit ball with a fixed center point (for kernel sizes != 15)."""
    rng = np.random.RandomState(seed)
    pts = rng.randn(num_points, 3).astype(np.float64)
    pts[0] = 0.0
    pts[1:] /= np.linalg.norm(pts[1:], axis=1, keepdims=True) / 0.5
    lr = 0.01
    for _ in range(steps):
        diff = pts[:, None] - pts[None]  # (K, K, 3)
        d = np.linalg.norm(diff, axis=-1) + 1e-6
        # inverse-square repulsion + weak pull to the ball
        force = (diff / d[..., None] ** 3).sum(1) - 2.0 * pts
        force[0] = 0.0
        pts += lr * force
        r = np.linalg.norm(pts[1:], axis=1, keepdims=True)
        pts[1:] = np.where(r > 1.0, pts[1:] / r, pts[1:])
    # rescale so mean non-center radius matches the canonical ~0.661
    r = np.linalg.norm(pts[1:], axis=1)
    pts[1:] *= 0.66 / r.mean()
    return pts.astype(np.float32)


def make_kernel_points(
    radius: float,
    num_points: int = 15,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Kernel point positions scaled to the conv radius.

    If ``key`` is given, applies the reference's load-time randomization
    (z-rotation + N(0, 0.01) jitter, kernel_points.py:426-453); otherwise
    returns the deterministic canonical disposition.
    """
    if num_points == 15:
        base = jnp.asarray(KERNEL_POINTS_15)
    else:
        base = jnp.asarray(_repulsion_dispositions(num_points))

    if key is not None:
        k_rot, k_noise = jax.random.split(key)
        theta = jax.random.uniform(k_rot, ()) * 2.0 * jnp.pi
        c, s = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        base = base + 0.01 * jax.random.normal(k_noise, base.shape)
        return (radius * base) @ rot
    return radius * base
