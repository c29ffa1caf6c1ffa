"""ThDRoFormer — 3D rotary conditional transformer (RDMNet core).

Re-design of reference rdmnet/thdroformer/thdroformer.py:253-347: interleaved
[rotary self-attention, vanilla cross-attention] blocks over the two clouds,
with positional angles derived from raw xyz by a Linear(3 -> hidden/2).

Unbatched (N, C) API over padded clouds with validity masks; vmap for batch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rdmnet_tpu.nn.attention import RotaryTransformerLayer, TransformerLayer
from rdmnet_tpu.nn.transformers import PEConditionalTransformer


class ThDRoFormer(nn.Module):
    """reference thdroformer.py:266-347.

    Args (call):
      ref_points/src_points: (N, 3) / (M, 3) padded node positions.
      ref_feats/src_feats: (N, C_in) / (M, C_in).
      ref_valid/src_valid: bool masks (True = real node).

    Returns (ref_feats, src_feats) with output_dim channels.
    """

    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    num_layers: int
    # per-self-layer top-k fractions (reference k schedule, thdroformer.py:132-135)
    k: Optional[Tuple[float, ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        ref_points: jnp.ndarray,
        src_points: jnp.ndarray,
        ref_feats: jnp.ndarray,
        src_feats: jnp.ndarray,
        ref_valid: Optional[jnp.ndarray] = None,
        src_valid: Optional[jnp.ndarray] = None,
    ):
        # positional embedding: Linear(3 -> hidden/2) of raw xyz
        # (reference posEmbedding, thdroformer.py:253-263)
        # positional angles stay f32 (rotary phases are precision-sensitive)
        embed = nn.Dense(self.hidden_dim // 2, dtype=jnp.float32, name="embedding")
        ref_pe = embed(ref_points)
        src_pe = embed(src_points)

        in_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")
        ref_x = in_proj(ref_feats.astype(self.dtype))
        src_x = in_proj(src_feats.astype(self.dtype))

        # reference dynamic_attention keeps int(n * frac) keys where n is the
        # REAL node count (thdroformer.py:27 — no pads there); with static
        # capacities, the static top_k rank bound is int(cap * frac) and the
        # dynamic count int(valid * frac) masks ranks beyond it
        def dyn_count(valid, frac, kmax):
            if valid is None:
                return None
            count = jnp.floor(jnp.sum(valid).astype(jnp.float32) * frac)
            return jnp.clip(count.astype(jnp.int32), 1, kmax)

        for layer in range(self.num_layers):
            if self.k is not None:
                cap = ref_x.shape[0]
                frac = self.k[layer]
                topk = max(1, min(cap, int(cap * frac)))
                ref_kc = dyn_count(ref_valid, frac, topk)
                src_kc = dyn_count(src_valid, frac, topk)
            else:
                topk = None
                ref_kc = src_kc = None
            self_layer = RotaryTransformerLayer(
                self.hidden_dim, self.num_heads, topk=topk, dtype=self.dtype,
                name=f"self_{layer}"
            )
            ref_x = self_layer(ref_x, ref_x, ref_pe, memory_valid=ref_valid,
                               topk_count=ref_kc)
            src_x = self_layer(src_x, src_x, src_pe, memory_valid=src_valid,
                               topk_count=src_kc)

            cross_layer = TransformerLayer(
                self.hidden_dim, self.num_heads, dtype=self.dtype,
                name=f"cross_{layer}"
            )
            # sequential cross (reference parallel=False,
            # thdroformer.py:243-245): ref attends updated-src order preserved
            ref_x = cross_layer(ref_x, src_x, memory_valid=src_valid)
            src_x = cross_layer(src_x, ref_x, memory_valid=ref_valid)

        out_proj = nn.Dense(self.output_dim, dtype=self.dtype, name="out_proj")
        return (out_proj(ref_x).astype(jnp.float32),
                out_proj(src_x).astype(jnp.float32))


class APETransformer(nn.Module):
    """Absolute-positional-embedding ablation variant (reference
    thdroformer.py:368-448): posEmbedding2 = Linear(3 -> hidden) of raw
    xyz, fed to the geotransformer PEConditionalTransformer — i.e. the
    embeddings enter q/k through the shared proj_p projection only
    (pe_transformer.py:58-60); v and the residual stream never see them."""

    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(
        self,
        ref_points,
        src_points,
        ref_feats,
        src_feats,
        ref_valid=None,
        src_valid=None,
    ):
        embed = nn.Dense(self.hidden_dim, name="embedding")
        ref_pe = embed(ref_points)
        src_pe = embed(src_points)
        in_proj = nn.Dense(self.hidden_dim, name="in_proj")
        ref_x = in_proj(ref_feats)
        src_x = in_proj(src_feats)

        ref_x, src_x = PEConditionalTransformer(
            ("self", "cross") * self.num_layers,
            self.hidden_dim, self.num_heads, name="transformer",
        )(ref_x, src_x, ref_pe, src_pe, ref_valid=ref_valid, src_valid=src_valid)

        out_proj = nn.Dense(self.output_dim, name="out_proj")
        return out_proj(ref_x), out_proj(src_x)
