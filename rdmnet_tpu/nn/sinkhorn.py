"""Learnable log-domain Sinkhorn optimal transport (SuperGlue style).

Re-design of reference geotransformer/modules/sinkhorn/
learnable_sinkhorn.py:5-70 with the iteration loop as lax.scan (one compiled
loop body instead of 100 unrolled ops). Kept in f32: 100 log-domain
iterations drift in bf16 (SURVEY §7 hard part (e)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_INF = 1.0e12


def log_sinkhorn(scores, log_mu, log_nu, num_iterations: int):
    """Iterate u/v updates in log domain (reference :13-18)."""

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(scores + v[..., None, :], axis=-1)
        v = log_nu - jax.nn.logsumexp(scores + u[..., :, None], axis=-2)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=num_iterations)
    return scores + u[..., :, None] + v[..., None, :]


class LearnableLogOptimalTransport(nn.Module):
    """reference :5-70. Input scores (*, M, N) + row/col validity masks;
    output (*, M+1, N+1) log transport plan with learnable dustbin alpha."""

    num_iterations: int

    @nn.compact
    def __call__(self, scores, row_valid=None, col_valid=None, use_pallas=False):
        alpha = self.param("alpha", nn.initializers.ones, ())
        *lead, num_row, num_col = scores.shape

        if row_valid is None:
            row_valid = jnp.ones(tuple(lead) + (num_row,), bool)
        if col_valid is None:
            col_valid = jnp.ones(tuple(lead) + (num_col,), bool)

        # padded rows/cols: dustbin is always valid
        pad_row_valid = jnp.concatenate(
            [row_valid, jnp.ones(tuple(lead) + (1,), bool)], axis=-1
        )
        pad_col_valid = jnp.concatenate(
            [col_valid, jnp.ones(tuple(lead) + (1,), bool)], axis=-1
        )

        padded = jnp.pad(scores, [(0, 0)] * len(lead) + [(0, 1), (0, 1)])
        padded = padded.at[..., :, -1].set(alpha)
        padded = padded.at[..., -1, :].set(alpha)
        valid_mat = pad_row_valid[..., :, None] & pad_col_valid[..., None, :]
        padded = jnp.where(valid_mat, padded, -_INF)

        nr = jnp.sum(row_valid.astype(jnp.float32), axis=-1)
        nc = jnp.sum(col_valid.astype(jnp.float32), axis=-1)
        # eps guards: fully-masked patches (padded correspondences) must not
        # produce NaNs — their outputs are masked downstream
        nr = jnp.maximum(nr, 1e-9)
        nc = jnp.maximum(nc, 1e-9)
        norm = -jnp.log(nr + nc)  # (*,)

        log_mu = jnp.broadcast_to(
            norm[..., None], tuple(lead) + (num_row + 1,)
        ).at[..., -1].set(jnp.log(nc) + norm)
        log_nu = jnp.broadcast_to(
            norm[..., None], tuple(lead) + (num_col + 1,)
        ).at[..., -1].set(jnp.log(nr) + norm)
        log_mu = jnp.where(pad_row_valid, log_mu, -_INF)
        log_nu = jnp.where(pad_col_valid, log_nu, -_INF)

        if use_pallas and padded.ndim == 3:
            # fused single-kernel path (inference; no autodiff through it)
            from rdmnet_tpu.ops.pallas.sinkhorn import sinkhorn_pallas

            out = sinkhorn_pallas(
                padded, log_mu, log_nu, self.num_iterations,
                # Mosaic lowering exists only on real TPUs; interpret
                # everywhere else (cpu AND gpu backends)
                interpret=jax.default_backend() != "tpu",
            )
        else:
            out = log_sinkhorn(padded, log_mu, log_nu, self.num_iterations)
        return out - norm[..., None, None]
