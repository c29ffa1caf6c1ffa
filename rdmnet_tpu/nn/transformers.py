"""Conditional transformer variants (parity with the reference's ablation
stack, geotransformer/modules/transformer/{conditional_transformer.py:14-161,
lrpe_transformer.py:19-148, positional_embedding.py:37-66}):

* VanillaConditionalTransformer — plain self/cross blocks;
* PEConditionalTransformer — absolute positional embeddings projected by a
  shared proj_p and added to q/k (not v) in each self block
  (reference pe_transformer.py:15-76);
* LRPEConditionalTransformer — learnable relative positional embedding: a
  bank of P learnable embeddings scored against q (q·e_p), gathered by
  integer pair-distance indices and added to the attention logits.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdmnet_tpu.nn.attention import (
    AttentionOutput,
    TransformerLayer,
    _attend,
    _merge_heads,
    _split_heads,
)

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


class PEMultiHeadAttention(nn.Module):
    """Absolute-PE attention (reference pe_transformer.py:15-76):
    q = proj_q(f_q) + proj_p(e_q), k = proj_k(f_k) + proj_p(e_k) with a
    SHARED proj_p; v = proj_v(f_k) — the embedding never reaches v or the
    residual path."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_q, embed_k, kv_valid=None):
        h = self.num_heads
        proj_p = nn.Dense(self.d_model, name="proj_p")
        q = _split_heads(
            nn.Dense(self.d_model, name="proj_q")(input_q) + proj_p(embed_q), h
        )
        k = _split_heads(
            nn.Dense(self.d_model, name="proj_k")(input_k) + proj_p(embed_k), h
        )
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)
        return _merge_heads(_attend(q, k, v, kv_valid))


class PETransformerLayer(nn.Module):
    """PE attention + post-norm residual + FFN (reference
    pe_transformer.py:79-132)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_states, memory_states, input_emb, memory_emb,
                 memory_valid=None):
        hidden = PEMultiHeadAttention(
            self.d_model, self.num_heads, name="attention"
        )(input_states, memory_states, memory_states, input_emb, memory_emb,
          kv_valid=memory_valid)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(hidden + input_states)
        return AttentionOutput(self.d_model, name="output")(x)


def _pair_block_names(blocks: Sequence[str]):
    """Per-type layer indices (self_0, cross_0, self_1, ...) — the same
    scheme as the ThDRoFormer stack and utils/torch_convert's
    _map_transformer_key, so converted reference checkpoints land on
    matching keys."""
    counts: dict = {}
    names = []
    for block in blocks:
        i = counts.get(block, 0)
        counts[block] = i + 1
        names.append(f"{block}_{i}")
    return names


class VanillaConditionalTransformer(nn.Module):
    """Plain interleaved self/cross blocks (reference
    conditional_transformer.py:14-39)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, ref_feats, src_feats, ref_valid=None, src_valid=None):
        for block, name in zip(self.blocks, _pair_block_names(self.blocks)):
            layer = TransformerLayer(self.d_model, self.num_heads, name=name)
            if block == "self":
                ref_feats = layer(ref_feats, ref_feats, memory_valid=ref_valid)
                src_feats = layer(src_feats, src_feats, memory_valid=src_valid)
            else:
                ref_feats = layer(ref_feats, src_feats, memory_valid=src_valid)
                src_feats = layer(src_feats, ref_feats, memory_valid=ref_valid)
        return ref_feats, src_feats


class PEConditionalTransformer(nn.Module):
    """Self blocks are PETransformerLayers fed the positional embeddings;
    cross blocks are vanilla (reference conditional_transformer.py:42-70)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, ref_feats, src_feats, ref_emb, src_emb,
                 ref_valid=None, src_valid=None):
        for block, name in zip(self.blocks, _pair_block_names(self.blocks)):
            if block == "self":
                layer = PETransformerLayer(self.d_model, self.num_heads, name=name)
                ref_feats = layer(ref_feats, ref_feats, ref_emb, ref_emb,
                                  memory_valid=ref_valid)
                src_feats = layer(src_feats, src_feats, src_emb, src_emb,
                                  memory_valid=src_valid)
            else:
                layer = TransformerLayer(self.d_model, self.num_heads, name=name)
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
        for block, name in zip(self.blocks, _pair_block_names(self.blocks)):
            if block == "self":
                layer = LRPETransformerLayer(
                    self.d_model, self.num_heads, self.num_embeddings, name=name
                )
                ref_feats = layer(ref_feats, ref_feats, ref_emb_indices,
                                  memory_valid=ref_valid)
                src_feats = layer(src_feats, src_feats, src_emb_indices,
                                  memory_valid=src_valid)
            else:
                layer = TransformerLayer(self.d_model, self.num_heads, name=name)
                ref_feats = layer(ref_feats, src_feats, memory_valid=src_valid)
                src_feats = layer(src_feats, ref_feats, memory_valid=ref_valid)
        return ref_feats, src_feats
