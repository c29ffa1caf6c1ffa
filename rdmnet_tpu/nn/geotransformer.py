"""Original GeoTransformer stack (kept for parity/ablation).

Re-design of reference geotransformer/modules/geotransformer/
geotransformer.py:8-235 and modules/transformer/rpe_transformer.py:18-131:
superseded by ThDRoFormer in RDMNet (reference experiments/model.py:9-14)
but part of the framework's capability surface.

* GeometricStructureEmbedding: sinusoidal embedding of pairwise distances
  (sigma_d temperature) + max/mean-reduced triplet angular embedding over
  each point's k nearest neighbors (sigma_a temperature);
* RPE attention: relative positional embedding projected per head and added
  into the logits as q·p (rpe_transformer.py:51-59).

Unbatched (N, C) API with validity masks; vmap for batch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdmnet_tpu.nn.attention import AttentionOutput, TransformerLayer, _split_heads, _merge_heads
from rdmnet_tpu.ops.geometry import pairwise_sq_dist

_NEG_INF = -1.0e9
_BIG = 1.0e12


def sinusoidal_embedding(indices: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Sinusoidal embedding of real-valued indices (*, ) -> (*, D)
    (reference positional_embedding.py:29-55)."""
    half = d_model // 2
    div = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-jnp.log(10000.0) / half)
    )
    angles = indices[..., None] * div
    emb = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return emb.reshape(indices.shape + (d_model,))


class GeometricStructureEmbedding(nn.Module):
    """reference geotransformer.py:8-72 (masked, static shapes)."""

    hidden_dim: int
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"

    @nn.compact
    def __call__(self, points: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        sq_raw = pairwise_sq_dist(points, points)
        sq = sq_raw
        if valid is not None:
            sq = jnp.where(valid[None, :] & valid[:, None], sq_raw, _BIG)
        d_indices = jnp.sqrt(sq_raw) / self.sigma_d

        # k nearest neighbors excluding self
        k = self.angle_k
        neg_vals, knn_idx = jax.lax.top_k(-sq, k + 1)
        neg_vals, knn_idx = neg_vals[:, 1:], knn_idx[:, 1:]     # (N, k)
        knn_points = points[knn_idx]                            # (N, k, 3)
        ref_vec = knn_points - points[:, None, :]               # (N, k, 3)
        # with fewer than k valid neighbors, top_k falls back to masked
        # pairs whose ~1e9 padded coordinates would leak into every valid
        # row's angle max-reduction; substitute a unit vector (bounded,
        # NaN-free angles) for those slots
        sel_ok = neg_vals > -0.5 * _BIG                         # (N, k)
        ref_vec = jnp.where(
            sel_ok[..., None], ref_vec,
            jnp.asarray([1.0, 0.0, 0.0], points.dtype),
        )
        anc_vec = points[None, :, :] - points[:, None, :]       # (N, N, 3)
        # angles between anc (N, N) and each of the k ref vectors
        cross = jnp.cross(ref_vec[:, None, :, :], anc_vec[:, :, None, :])
        sin_v = jnp.linalg.norm(cross, axis=-1)                 # (N, N, k)
        cos_v = jnp.sum(ref_vec[:, None, :, :] * anc_vec[:, :, None, :], axis=-1)
        angles = jnp.arctan2(sin_v, cos_v)
        a_indices = angles * (180.0 / (self.sigma_a * jnp.pi))

        d_emb = nn.Dense(self.hidden_dim, name="proj_d")(
            sinusoidal_embedding(d_indices, self.hidden_dim)
        )
        a_emb = nn.Dense(self.hidden_dim, name="proj_a")(
            sinusoidal_embedding(a_indices, self.hidden_dim)
        )
        if self.reduction_a == "max":
            a_emb = jnp.max(a_emb, axis=2)
        else:
            a_emb = jnp.mean(a_emb, axis=2)
        return d_emb + a_emb                                     # (N, N, C)


class RPEMultiHeadAttention(nn.Module):
    """Attention with relative positional logits q·p
    (reference rpe_transformer.py:18-70)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_qk, kv_valid=None):
        h = self.num_heads
        d = self.d_model // h
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)
        # embed_qk: (N, M, C) -> per-head (h, N, M, d)
        p = nn.Dense(self.d_model, name="proj_p")(embed_qk)
        n, m, _ = embed_qk.shape
        p = p.reshape(n, m, h, d).transpose(2, 0, 1, 3)

        qk = jnp.einsum("hnd,hmd->hnm", q, k, preferred_element_type=jnp.float32)
        qp = jnp.einsum("hnd,hnmd->hnm", q, p, preferred_element_type=jnp.float32)
        scores = (qk + qp) / jnp.sqrt(jnp.asarray(d, jnp.float32))
        if kv_valid is not None:
            scores = jnp.where(kv_valid[None, None, :], scores, _NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hnm,hmd->hnd", attn, v, preferred_element_type=jnp.float32)
        return _merge_heads(out)


class RPETransformerLayer(nn.Module):
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_states, memory_states, embed_qk, memory_valid=None):
        hidden = RPEMultiHeadAttention(self.d_model, self.num_heads, name="attention")(
            input_states, memory_states, memory_states, embed_qk, kv_valid=memory_valid
        )
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(hidden + input_states)
        return AttentionOutput(self.d_model, name="output")(x)


class GeometricTransformer(nn.Module):
    """reference geotransformer.py:75-235: interleaved RPE-self/vanilla-cross
    conditional stack with geometric structure embeddings."""

    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: Sequence[str]
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"

    @nn.compact
    def __call__(
        self,
        ref_points,
        src_points,
        ref_feats,
        src_feats,
        ref_valid=None,
        src_valid=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        embed = GeometricStructureEmbedding(
            self.hidden_dim, self.sigma_d, self.sigma_a, self.angle_k,
            self.reduction_a, name="embedding",
        )
        ref_emb = embed(ref_points, ref_valid)
        src_emb = embed(src_points, src_valid)

        in_proj = nn.Dense(self.hidden_dim, name="in_proj")
        ref_x = in_proj(ref_feats)
        src_x = in_proj(src_feats)

        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = RPETransformerLayer(
                    self.hidden_dim, self.num_heads, name=f"self_{i}"
                )
                ref_x = layer(ref_x, ref_x, ref_emb, memory_valid=ref_valid)
                src_x = layer(src_x, src_x, src_emb, memory_valid=src_valid)
            elif block == "cross":
                layer = TransformerLayer(
                    self.hidden_dim, self.num_heads, name=f"cross_{i}"
                )
                ref_x = layer(ref_x, src_x, memory_valid=src_valid)
                src_x = layer(src_x, ref_x, memory_valid=ref_valid)
            else:
                raise ValueError(f"unknown block type {block}")

        out_proj = nn.Dense(self.output_dim, name="out_proj")
        return out_proj(ref_x), out_proj(src_x)
