"""Vote/offset layer (RDMNet core).

Re-design of reference rdmnet/vote/vote.py:43-117: a shared MLP over node
features regresses per-node xyz offsets (clamped to ±max_translate_range)
that shift nodes toward object centers, plus feature offsets (residual +
LayerNorm). NMS over the shifted nodes lives in rdmnet_tpu.ops.nms.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from rdmnet_tpu.config import VoteConfig


class VoteLayer(nn.Module):
    """reference vote.py:43-117 (unbatched: (M, 3) nodes, (M, C) feats)."""

    cfg: VoteConfig
    feat_dim: int

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = feats
        for i, width in enumerate(self.cfg.mlps):
            x = nn.Dense(width, name=f"mlp_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"mlp_norm_{i}")(x)
            x = nn.relu(x)

        offsets = nn.Dense(3 + self.feat_dim, name="ctr_reg")(x)
        ctr_offsets = offsets[..., :3]
        feat_offsets = offsets[..., 3:]

        limit = jnp.asarray(self.cfg.max_translate_range, xyz.dtype)
        ctr_offsets = jnp.clip(ctr_offsets, -limit, limit)
        vote_xyz = xyz + ctr_offsets

        new_feats = nn.LayerNorm(epsilon=1e-5, name="out_norm")(feats + feat_offsets)
        return vote_xyz, new_feats
