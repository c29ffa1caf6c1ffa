"""Attention building blocks (masked, static-shape, unbatched).

Re-design of reference geotransformer/modules/transformer/vanilla_transformer.py
and rdmnet/thdroformer/thdroformer.py:20-202 for padded clouds:

* convention here: ``valid`` masks are True for REAL entries (the reference
  uses inverted ``key_masks`` where True = ignored);
* the reference's ThDRoFormer ignores masks entirely (it has no pads); with
  static capacities we must mask invalid keys to -inf before softmax;
* rotary embedding: per-head angles θ = sigmoid(Linear(xyz)) · 2π, each angle
  shared by an adjacent feature pair (the reference materializes this with a
  nearest-neighbor interpolate, thdroformer.py:76-78 — here we rotate the
  (d/2, 2)-paired features directly, which is the same computation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_NEG_INF = -1.0e9


def rotary_rotate(x: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate adjacent feature pairs of x by per-pair angles.

    Args:
      x: (..., D) with D even; pairs are (x[2i], x[2i+1]).
      theta: (..., D/2) angles.

    Returns rotated features, identical to the reference's
    cos/sin construction (thdroformer.py:71-85).
    """
    shape = x.shape
    xp = x.reshape(shape[:-1] + (shape[-1] // 2, 2))
    cos = jnp.cos(theta)[..., None]
    sin = jnp.sin(theta)[..., None]
    x0 = xp[..., 0:1]
    x1 = xp[..., 1:2]
    rot = jnp.concatenate([x0 * cos[..., 0:1] - x1 * sin[..., 0:1],
                           x1 * cos[..., 0:1] + x0 * sin[..., 0:1]], axis=-1)
    return rot.reshape(shape)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    n, c = x.shape
    return x.reshape(n, num_heads, c // num_heads).transpose(1, 0, 2)  # (H, N, d)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    h, n, d = x.shape
    return x.transpose(1, 0, 2).reshape(n, h * d)


def _attend(
    q: jnp.ndarray,           # (H, N, d)
    k: jnp.ndarray,           # (H, M, d)
    v: jnp.ndarray,           # (H, M, d)
    kv_valid: Optional[jnp.ndarray],  # (M,) True=real
    topk: Optional[int] = None,
    topk_count: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    d = q.shape[-1]
    # logits/softmax in f32 regardless of q/k dtype
    scores = jnp.einsum("hnd,hmd->hnm", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(d, scores.dtype))
    if kv_valid is not None:
        scores = jnp.where(kv_valid[None, None, :], scores, _NEG_INF)
    if topk is None:
        attn = jax.nn.softmax(scores, axis=-1)
    else:
        # sparse top-k attention (reference dynamic_attention,
        # thdroformer.py:20-40): softmax over the top-k scores per query,
        # zeros elsewhere. ``topk`` is the STATIC rank bound; ``topk_count``
        # (dynamic scalar <= topk) emulates the reference's int(n * frac)
        # over the VALID node count in the padded regime: ranks beyond it
        # are masked out before the softmax.
        top_vals, top_idx = jax.lax.top_k(scores, topk)  # (H, N, topk)
        if topk_count is not None:
            rank_ok = jnp.arange(topk) < topk_count
            top_vals = jnp.where(rank_ok[None, None, :], top_vals, _NEG_INF)
        probs = jax.nn.softmax(top_vals, axis=-1)
        one_hot = jax.nn.one_hot(top_idx, scores.shape[-1], dtype=scores.dtype)
        attn = jnp.einsum("hnk,hnkm->hnm", probs, one_hot, preferred_element_type=jnp.float32)
    return jnp.einsum("hnm,hmd->hnd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


class MultiHeadAttention(nn.Module):
    """Vanilla MHA (reference vanilla_transformer.py:15-70)."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_q, input_k, input_v, kv_valid=None):
        q = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(input_q), self.num_heads)
        k = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(input_k), self.num_heads)
        v = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(input_v), self.num_heads)
        return _merge_heads(_attend(q, k, v, kv_valid))


class RotaryMultiHeadAttention(nn.Module):
    """MHA with 3D rotary positional rotation of q and k
    (reference RPEMultiHeadAttention, thdroformer.py:88-139)."""

    d_model: int
    num_heads: int
    topk: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_q, input_k, input_v, pos_emb_q, pos_emb_k,
                 kv_valid=None, topk_count=None):
        h = self.num_heads
        q = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(input_q), h)
        k = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(input_k), h)
        v = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(input_v), h)

        # pos_emb: (N, d_model/2) -> per-head angle per feature pair
        def theta(pe, n):
            pe_h = pe.reshape(n, h, self.d_model // (2 * h)).transpose(1, 0, 2)
            return jax.nn.sigmoid(pe_h) * (2.0 * jnp.pi)

        q = rotary_rotate(q.astype(jnp.float32), theta(pos_emb_q, input_q.shape[0])).astype(self.dtype)
        k = rotary_rotate(k.astype(jnp.float32), theta(pos_emb_k, input_k.shape[0])).astype(self.dtype)
        return _merge_heads(
            _attend(q, k, v, kv_valid, topk=self.topk, topk_count=topk_count)
        )


class AttentionOutput(nn.Module):
    """Post-norm FFN (expand x2) (reference output_layer.py:6-21)."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.d_model * 2, dtype=self.dtype, name="expand")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="squeeze")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x + y).astype(self.dtype)


class TransformerLayer(nn.Module):
    """Vanilla attention layer + FFN, post-norm residual
    (reference vanilla_transformer.py:73-129)."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_states, memory_states, memory_valid=None):
        hidden = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype,
                                    name="attention")(
            input_states, memory_states, memory_states, kv_valid=memory_valid
        )
        hidden = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(hidden)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(hidden + input_states).astype(self.dtype)
        return AttentionOutput(self.d_model, dtype=self.dtype, name="output")(x)


class RotaryTransformerLayer(nn.Module):
    """Rotary self-attention layer + FFN (reference RPETransformerLayer,
    thdroformer.py:142-202)."""

    d_model: int
    num_heads: int
    topk: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_states, memory_states, pos_emb, memory_valid=None,
                 topk_count=None):
        hidden = RotaryMultiHeadAttention(
            self.d_model, self.num_heads, topk=self.topk, dtype=self.dtype,
            name="attention"
        )(input_states, memory_states, memory_states, pos_emb, pos_emb,
          kv_valid=memory_valid, topk_count=topk_count)
        hidden = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(hidden)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(hidden + input_states).astype(self.dtype)
        return AttentionOutput(self.d_model, dtype=self.dtype, name="output")(x)
