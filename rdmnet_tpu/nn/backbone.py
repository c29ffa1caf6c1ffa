"""KPConv-FPN backbone: 5-stage encoder, 3-stage decoder.

Re-design of reference experiments/backbone.py:7-151 over the CloudPyramid
pytree (unbatched — one cloud; vmap for the (ref, src) pair / batch).
Channel schedule: 1 -> 64 -> 128 -> 256 -> 512 -> 1024 -> 2048 on the
encoder; decoder consumes the transformer-conditioned coarse features
(256 + 1 score channel) and emits fine features (output_dim + 1).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rdmnet_tpu.config import BackboneConfig
from rdmnet_tpu.graph.pyramid import CloudPyramid
from rdmnet_tpu.nn.kpconv import (
    ConvBlock,
    LastUnaryBlock,
    ResidualBlock,
    UnaryBlock,
    kpconv_influence,
    nearest_upsample,
)
from rdmnet_tpu.nn.kernel_points import make_kernel_points


class Encoder(nn.Module):
    """5-stage KPConv encoder (reference backbone.py:7-107)."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, pyr: CloudPyramid) -> List[jnp.ndarray]:
        c = self.cfg
        feats = feats.astype(self.dtype)
        d = c.init_dim
        r = c.init_radius
        s = c.init_sigma
        ks = c.kernel_size
        gn = c.group_norm
        pts, nbrs, subs = pyr.points, pyr.neighbors, pyr.subsampling
        masks = [pyr.mask(i) for i in range(pyr.num_stages)]

        feats_list = []

        # geometry-only kernel influences are shared by every block with the
        # same (points, neighbors, radius): compute once per level. Only
        # valid with a shared canonical kernel disposition — disabled for
        # converted reference checkpoints (per-layer kernels; see
        # BackboneConfig.shared_influence).
        def self_influence(lvl, radius, sigma):
            if not c.shared_influence:
                return None
            return kpconv_influence(
                pts[lvl], pts[lvl], nbrs[lvl], make_kernel_points(radius, ks), sigma
            )

        infl0 = self_influence(0, r, s)
        nbr_feats0 = None
        if c.ones_input and c.input_dim == 1 and hasattr(pyr, "index_valid"):
            # ones-input fast path: the gathered level-0 features equal the
            # neighbor-validity indicator — index arithmetic instead of a
            # (N, H, 1) gather (exact same values, golden-parity safe)
            nbr_feats0 = pyr.index_valid(0, nbrs[0])[..., None].astype(self.dtype)
        x = ConvBlock(c.input_dim, d, ks, r, s, gn, dtype=self.dtype,
                      name="encoder1_1")(
            feats, pts[0], pts[0], nbrs[0], masks[0], influence=infl0,
            nbr_feats=nbr_feats0,
        )
        x = ResidualBlock(d, d * 2, ks, r, s, gn, dtype=self.dtype,
                          name="encoder1_2")(
            x, pts[0], pts[0], nbrs[0], masks[0], masks[0], influence=infl0
        )
        feats_list.append(x)

        stage_dims = [(d * 2, d * 4), (d * 4, d * 8), (d * 8, d * 16), (d * 16, d * 32)]
        for i, (din, dout) in enumerate(stage_dims):
            lvl = i + 1
            x = ResidualBlock(
                din, din, ks, r * 2**i, s * 2**i, gn, strided=True,
                dtype=self.dtype, name=f"encoder{lvl + 1}_1",
            )(x, pts[lvl], pts[lvl - 1], subs[lvl - 1], masks[lvl], masks[lvl - 1])
            infl = self_influence(lvl, r * 2 ** (i + 1), s * 2 ** (i + 1))
            x = ResidualBlock(
                din, dout, ks, r * 2 ** (i + 1), s * 2 ** (i + 1), gn,
                dtype=self.dtype, name=f"encoder{lvl + 1}_2",
            )(x, pts[lvl], pts[lvl], nbrs[lvl], masks[lvl], masks[lvl],
              influence=infl)
            x = ResidualBlock(
                dout, dout, ks, r * 2 ** (i + 1), s * 2 ** (i + 1), gn,
                dtype=self.dtype, name=f"encoder{lvl + 1}_3",
            )(x, pts[lvl], pts[lvl], nbrs[lvl], masks[lvl], masks[lvl],
              influence=infl)
            feats_list.append(x)

        return feats_list


class Decoder(nn.Module):
    """3-stage FPN decoder with skip connections (reference backbone.py:110-151).

    Input ``feats_list[-1]`` is expected to already be the
    transformer-conditioned coarse features (output_dim + 1 channels, the +1
    being the n2p score channel concatenated by the model,
    reference model.py:165-167). Returns [fine (level-1) feats, ...] like the
    reference's reversed list.
    """

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats_list: Sequence[jnp.ndarray], pyr: CloudPyramid) -> List[jnp.ndarray]:
        c = self.cfg
        feats_list = [f.astype(self.dtype) for f in feats_list]
        d = c.init_dim
        gn = c.group_norm
        ups = pyr.upsampling
        masks = [pyr.mask(i) for i in range(pyr.num_stages)]

        out = []
        x = nearest_upsample(feats_list[4], ups[3])
        x = jnp.concatenate([x, feats_list[3]], axis=1)
        x = UnaryBlock(x.shape[1], d * 16, gn, dtype=self.dtype, name="decoder4")(x, masks[3])
        out.append(x)

        x = nearest_upsample(x, ups[2])
        x = jnp.concatenate([x, feats_list[2]], axis=1)
        x = UnaryBlock(x.shape[1], d * 8, gn, dtype=self.dtype, name="decoder3")(x, masks[2])
        out.append(x)

        x = nearest_upsample(x, ups[1])
        x = jnp.concatenate([x, feats_list[1]], axis=1)
        x = LastUnaryBlock(c.output_dim + 1, name="decoder2")(x).astype(jnp.float32)
        out.append(x)

        out.reverse()
        return out
