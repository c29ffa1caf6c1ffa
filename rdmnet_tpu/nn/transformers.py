"""Conditional transformer variants (parity with the reference's ablation
stack, geotransformer/modules/transformer/{conditional_transformer.py:14-161,
lrpe_transformer.py:19-148, positional_embedding.py:37-66}):

* VanillaConditionalTransformer — plain self/cross blocks;
* PEConditionalTransformer — absolute positional embeddings added to the
  features before each self block;
* LRPEConditionalTransformer — learnable relative positional embedding: a
  bank of P learnable embeddings scored against q (q·e_p), gathered by
  integer pair-distance indices and added to the attention logits.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdmnet_tpu.nn.attention import AttentionOutput, TransformerLayer, _merge_heads, _split_heads

_NEG_INF = -1.0e9


class LearnablePositionalEmbedding(nn.Module):
    """Truncated learnable embedding table + LayerNorm
    (reference positional_embedding.py:37-66)."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, emb_indices: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embeddings",
            nn.initializers.normal(1.0),
            (self.num_embeddings, self.embedding_dim),
        )
        idx = jnp.minimum(emb_indices, self.num_embeddings - 1).astype(jnp.int32)
        emb = jnp.take(table, idx, axis=0)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(emb)


class LRPEMultiHeadAttention(nn.Module):
    """Learnable-RPE attention (reference lrpe_transformer.py:19-93):
    logits = (q·k + gather_p(q·e_p)) / sqrt(d)."""

    d_model: int
    num_heads: int
    num_embeddings: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, emb_indices_qk, kv_valid=None):
        h = self.num_heads
        d = self.d_model // h
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)

        bank = LearnablePositionalEmbedding(
            self.num_embeddings, self.d_model, name="embedding"
        )(jnp.arange(self.num_embeddings))                       # (P, C)
        bank = bank.reshape(self.num_embeddings, h, d).transpose(1, 0, 2)  # (h, P, d)
        scores_p = jnp.einsum("hnd,hpd->hnp", q, bank,
                              preferred_element_type=jnp.float32)  # (h, N, P)
        idx = jnp.minimum(emb_indices_qk, self.num_embeddings - 1).astype(jnp.int32)
        scores_rpe = jnp.take_along_axis(
            scores_p, jnp.broadcast_to(idx[None], (h,) + idx.shape), axis=2
        )                                                          # (h, N, M)

        qk = jnp.einsum("hnd,hmd->hnm", q, k, preferred_element_type=jnp.float32)
        scores = (qk + scores_rpe) / jnp.sqrt(jnp.asarray(d, jnp.float32))
        if kv_valid is not None:
            scores = jnp.where(kv_valid[None, None, :], scores, _NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hnm,hmd->hnd", attn, v, preferred_element_type=jnp.float32)
        return _merge_heads(out)


class LRPETransformerLayer(nn.Module):
    d_model: int
    num_heads: int
    num_embeddings: int

    @nn.compact
    def __call__(self, input_states, memory_states, emb_indices, memory_valid=None):
        hidden = LRPEMultiHeadAttention(
            self.d_model, self.num_heads, self.num_embeddings, name="attention"
        )(input_states, memory_states, memory_states, emb_indices, kv_valid=memory_valid)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(hidden + input_states)
        return AttentionOutput(self.d_model, name="output")(x)


class VanillaConditionalTransformer(nn.Module):
    """Plain interleaved self/cross blocks (reference
    conditional_transformer.py:14-39)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, ref_feats, src_feats, ref_valid=None, src_valid=None):
        for i, block in enumerate(self.blocks):
            layer = TransformerLayer(self.d_model, self.num_heads, name=f"{block}_{i}")
            if block == "self":
                ref_feats = layer(ref_feats, ref_feats, memory_valid=ref_valid)
                src_feats = layer(src_feats, src_feats, memory_valid=src_valid)
            else:
                ref_feats = layer(ref_feats, src_feats, memory_valid=src_valid)
                src_feats = layer(src_feats, ref_feats, memory_valid=ref_valid)
        return ref_feats, src_feats


class PEConditionalTransformer(nn.Module):
    """Self blocks consume feats + absolute positional embeddings
    (reference conditional_transformer.py:42-70)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, ref_feats, src_feats, ref_emb, src_emb,
                 ref_valid=None, src_valid=None):
        for i, block in enumerate(self.blocks):
            layer = TransformerLayer(self.d_model, self.num_heads, name=f"{block}_{i}")
            if block == "self":
                ref_feats = layer(ref_feats + ref_emb, ref_feats + ref_emb,
                                  memory_valid=ref_valid)
                src_feats = layer(src_feats + src_emb, src_feats + src_emb,
                                  memory_valid=src_valid)
            else:
                ref_feats = layer(ref_feats, src_feats, memory_valid=src_valid)
                src_feats = layer(src_feats, ref_feats, memory_valid=ref_valid)
        return ref_feats, src_feats


class LRPEConditionalTransformer(nn.Module):
    """Self blocks use learnable relative positional logits over integer
    pair-distance indices (reference conditional_transformer.py:120-161)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    num_embeddings: int = 64

    @nn.compact
    def __call__(self, ref_feats, src_feats, ref_emb_indices, src_emb_indices,
                 ref_valid=None, src_valid=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = LRPETransformerLayer(
                    self.d_model, self.num_heads, self.num_embeddings,
                    name=f"self_{i}",
                )
                ref_feats = layer(ref_feats, ref_feats, ref_emb_indices,
                                  memory_valid=ref_valid)
                src_feats = layer(src_feats, src_feats, src_emb_indices,
                                  memory_valid=src_valid)
            else:
                layer = TransformerLayer(
                    self.d_model, self.num_heads, name=f"cross_{i}"
                )
                ref_feats = layer(ref_feats, src_feats, memory_valid=src_valid)
                src_feats = layer(src_feats, ref_feats, memory_valid=ref_valid)
        return ref_feats, src_feats
