"""KPConv layer and block set (flax, unbatched (N, C); vmap for batch).

Functional re-design of reference geotransformer/modules/kpconv/
{kpconv,modules,functional}.py over the padded/sentinel ABI:

* neighbor gathers use sentinel-index fill instead of concatenated shadow
  rows (kpconv.py:91,103);
* GroupNorm computes statistics over valid points only (the reference has
  no pad rows; we must exclude them or pads would pollute per-group stats);
* all matmuls carry preferred_element_type=f32 so the MXU accumulates in f32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdmnet_tpu.nn.kernel_points import make_kernel_points
from rdmnet_tpu.ops.geometry import take_padded

_INF_POINT = 1.0e6  # shadow-neighbor coordinate (reference kpconv.py:37 inf)


def gather_neighbors(x: jnp.ndarray, indices: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """(N, C) gathered by (M, H) sentinel-padded indices -> (M, H, C).
    Alias of ops.geometry.take_padded — the framework-wide masking ABI —
    under KPConv's local vocabulary."""
    return take_padded(x, indices, fill_value=fill)


def maxpool(x: jnp.ndarray, neighbor_indices: jnp.ndarray) -> jnp.ndarray:
    """Neighborhood max-pool; missing neighbors contribute 0
    (reference functional.py:54-67 pads with a zero row — kept for parity)."""
    feats = gather_neighbors(x, neighbor_indices, fill=0.0)
    return jnp.max(feats, axis=1)


def nearest_upsample(x: jnp.ndarray, upsample_indices: jnp.ndarray) -> jnp.ndarray:
    """Copy each query's nearest support feature (first neighbor column;
    reference functional.py:6-22)."""
    return jnp.take(x, upsample_indices[:, 0], axis=0, mode="fill", fill_value=0.0)


def knn_interpolate(
    s_feats: jnp.ndarray,
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    neighbor_indices: jnp.ndarray,
    k: int,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-distance kNN interpolation (reference functional.py:25-51)."""
    knn_indices = neighbor_indices[:, :k]
    knn_points = gather_neighbors(s_points, knn_indices, fill=0.0)
    knn_feats = gather_neighbors(s_feats, knn_indices, fill=0.0)
    sq = jnp.sum((q_points[:, None] - knn_points) ** 2, axis=-1)
    masks = (knn_indices < s_points.shape[0]).astype(s_feats.dtype)
    w = masks / (sq + eps)
    w = w / (jnp.sum(w, axis=1, keepdims=True) + eps)
    return jnp.sum(knn_feats * w[..., None], axis=1)


def kpconv_influence(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    neighbor_indices: jnp.ndarray,
    kernel_points: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Geometry-only part of KPConv: linear-correlation influence of each
    kernel point for every (query, neighbor) pair -> (M, H, K).

    Depends only on positions/indices, so blocks sharing the same
    (points, neighbors, radius, sigma) — e.g. the 2-3 residual blocks of an
    encoder stage — compute it once and pass it in.
    """
    nbr_pts = gather_neighbors(s_points, neighbor_indices, fill=_INF_POINT)
    offsets = nbr_pts - q_points[:, None, :]
    diff = offsets[:, :, None, :] - kernel_points[None, None, :, :]
    sq_dist = jnp.sum(diff * diff, axis=-1)
    return jnp.maximum(1.0 - jnp.sqrt(sq_dist) / sigma, 0.0)


# Measured negative result (do not re-attempt blindly): fusing the points
# gather and/or the strided-shortcut gather into the feature gather via a
# concatenated [points | feats] array REGRESSED the pipeline 3-11%
# (11.4 -> 10.2-11.1 pairs/s). XLA row gathers are fixed-cost per row, but
# the jnp.concatenate materializes a fresh lane-padded copy of the support
# array whose write+read traffic exceeds the saved gather pass.


def global_avgpool(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked global average over a padded cloud (reference
    functional.py:70-90 loops per batch element; here one masked mean)."""
    m = mask.astype(x.dtype)[:, None]
    return jnp.sum(x * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)


class KPConv(nn.Module):
    """Kernel-point convolution (reference kpconv.py:10-133).

    forward(s_feats (N, Cin), q_points (M, 3), s_points (N, 3),
    neighbor_indices (M, H)) -> (M, Cout).
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 15
    radius: float = 1.275
    sigma: float = 0.6
    use_bias: bool = True
    randomize_kernel: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices,
                 influence=None, nbr_feats=None):
        """``nbr_feats`` overrides the gathered (M, H, Cin) neighbor
        features — used by the ones-input fast path (the gathered values
        are the validity indicator, computable without the gather)."""
        k = self.kernel_size
        weights = self.param(
            "weights",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, self.in_channels, self.out_channels),
        )
        # kernel_points is ALWAYS a (stop-gradient) parameter so converted
        # reference checkpoints restore each layer's own disposition — the
        # reference randomly rotates + jitters the kernel per layer at
        # build time (kernel_points.py:426-453, unseeded), so its trained
        # weights only make sense with the exact kernels in the state_dict.
        # Fresh training here initializes the deterministic canonical
        # disposition (a deliberate reproducibility improvement), or the
        # reference's randomization with randomize_kernel=True. Never
        # trained (stop_gradient; excluded from weight decay in
        # engine/train_step.create_optimizer).
        if self.randomize_kernel:
            init = lambda key: make_kernel_points(self.radius, k, key=key)
        else:
            init = lambda key: make_kernel_points(self.radius, k)
        kernel_points = jax.lax.stop_gradient(self.param("kernel_points", init))

        if influence is None:
            influence = kpconv_influence(
                q_points, s_points, neighbor_indices, kernel_points, self.sigma
            )

        if nbr_feats is None:
            nbr_feats = gather_neighbors(s_feats, neighbor_indices, fill=0.0)  # (M, H, C)
        # (M, K, H) @ (M, H, C) -> (M, K, C); MXU in compute dtype, f32 accum
        weighted = jnp.einsum(
            "mhk,mhc->mkc",
            influence.astype(self.dtype),
            nbr_feats.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        # per-kernel-point channel mixing, summed over kernel points
        out = jnp.einsum(
            "mkc,kcd->md",
            weighted.astype(self.dtype),
            weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )

        # neighbor-count normalization (reference kpconv.py:113-116: counts
        # neighbors whose gathered feature row is non-empty)
        nbr_sum = jnp.sum(nbr_feats, axis=-1)
        nbr_num = jnp.sum((nbr_sum > 0.0).astype(out.dtype), axis=-1)
        out = out / jnp.maximum(nbr_num, 1.0)[:, None]

        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + bias
        return out


class MaskedGroupNorm(nn.Module):
    """GroupNorm over a point cloud: per-group statistics over all *valid*
    points and the group's channels (matches the reference's (1, C, N)
    GroupNorm trick, modules.py:33-50, but excludes pad rows)."""

    num_groups: int
    num_channels: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)  # statistics always in f32
        n, c = x.shape
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        m = mask.astype(x.dtype)[:, None]
        xg = (x * m).reshape(n, g, c // g)
        count = jnp.maximum(jnp.sum(m), 1.0) * (c // g)
        mean = jnp.sum(xg, axis=(0, 2)) / count  # (g,)
        centered = (x.reshape(n, g, c // g) - mean[None, :, None]) * m[:, :, None]
        var = jnp.sum(centered * centered, axis=(0, 2)) / count
        inv = jax.lax.rsqrt(var + self.eps)
        out = centered * inv[None, :, None]
        return (out.reshape(n, c) * scale + bias).astype(self.dtype)


class UnaryBlock(nn.Module):
    """Linear -> GroupNorm -> LeakyReLU(0.1) (reference modules.py:53-83)."""

    in_channels: int
    out_channels: int
    group_norm: int
    has_relu: bool = True
    use_bias: bool = True
    layer_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        x = nn.Dense(self.out_channels, use_bias=self.use_bias, dtype=self.dtype,
                     name="mlp")(x)
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        else:
            x = MaskedGroupNorm(self.group_norm, self.out_channels,
                                dtype=self.dtype, name="norm")(x, mask)
        if self.has_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class LastUnaryBlock(nn.Module):
    """Plain linear head (reference modules.py:86-101)."""

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_channels, use_bias=self.use_bias, name="mlp")(x)


class ConvBlock(nn.Module):
    """KPConv -> GroupNorm -> LeakyReLU (reference modules.py:104-146)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices, q_mask,
                 influence=None, nbr_feats=None):
        x = KPConv(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            self.radius,
            self.sigma,
            dtype=self.dtype,
            name="KPConv",
        )(s_feats, q_points, s_points, neighbor_indices, influence=influence,
          nbr_feats=nbr_feats)
        x = MaskedGroupNorm(self.group_norm, self.out_channels, dtype=self.dtype,
                            name="norm")(x, q_mask)
        return nn.leaky_relu(x, 0.1)


class ResidualBlock(nn.Module):
    """Bottleneck residual KPConv block (reference modules.py:149-225)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    strided: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices, q_mask, s_mask,
                 influence=None):
        mid = self.out_channels // 4

        if self.in_channels != mid:
            x = UnaryBlock(self.in_channels, mid, self.group_norm, dtype=self.dtype,
                           name="unary1")(s_feats, s_mask)
        else:
            x = s_feats

        x = KPConv(mid, mid, self.kernel_size, self.radius, self.sigma,
                   dtype=self.dtype, name="KPConv")(
            x, q_points, s_points, neighbor_indices, influence=influence
        )
        x = MaskedGroupNorm(self.group_norm, mid, dtype=self.dtype,
                            name="norm_conv")(x, q_mask)
        x = nn.leaky_relu(x, 0.1)

        x = UnaryBlock(mid, self.out_channels, self.group_norm, has_relu=False,
                       dtype=self.dtype, name="unary2")(x, q_mask)

        if self.strided:
            shortcut = maxpool(s_feats, neighbor_indices)
        else:
            shortcut = s_feats
        if self.in_channels != self.out_channels:
            shortcut = UnaryBlock(
                self.in_channels,
                self.out_channels,
                self.group_norm,
                has_relu=False,
                dtype=self.dtype,
                name="unary_shortcut",
            )(shortcut, q_mask)

        return nn.leaky_relu(x + shortcut, 0.1)
