"""Fused log-domain Sinkhorn as a Pallas TPU kernel.

The jnp implementation (rdmnet_tpu/nn/sinkhorn.py) lowers to a lax.scan
whose every iteration streams the (P, K+1, K+1) score block through HBM.
This kernel keeps a block of patches resident in VMEM and runs ALL
iterations on-chip: one kernel launch, HBM traffic = read scores once +
write the plan once.

Used on the inference path (no gradient); training keeps the scan
implementation for autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sinkhorn_kernel(scores_ref, log_mu_ref, log_nu_ref, out_ref, *, num_iterations):
    s = scores_ref[:]          # (BP, K1, K1)
    log_mu = log_mu_ref[:]     # (BP, K1)
    log_nu = log_nu_ref[:]

    def lse(t, axis):
        m = jnp.max(t, axis=axis)
        return m + jnp.log(jnp.sum(jnp.exp(t - jnp.expand_dims(m, axis)), axis=axis))

    def body(_, carry):
        u, v = carry
        u = log_mu - lse(s + v[:, None, :], axis=2)
        v = log_nu - lse(s + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, num_iterations, body, (u0, v0))
    out_ref[:] = s + u[:, :, None] + v[:, None, :]


def _choose_block(p: int, block_patches: int) -> tuple[int, int]:
    """Pick a Mosaic-legal patch-block size and the needed leading pad.

    The TPU lowering requires each block dim among the last two to be
    divisible by the sublane count (8) OR equal to the overall array dim.
    The (bp, K1) marginal blocks put bp in sublane position, so any
    multi-block grid needs bp % 8 == 0; a single block (bp == padded P)
    is legal at any size. Verified on chip by scripts/tpu_smoke.py.
    """
    bp = min(block_patches, p)
    if bp < p and bp % 8:
        bp = min(p, -(-bp // 8) * 8)  # round up to a sublane multiple
    return bp, (-p) % bp


def sinkhorn_pallas(
    scores: jnp.ndarray,     # (P, K1, K1) padded scores (masked entries -inf)
    log_mu: jnp.ndarray,     # (P, K1)
    log_nu: jnp.ndarray,     # (P, K1)
    num_iterations: int,
    block_patches: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    p, k1, _ = scores.shape
    bp, pad = _choose_block(p, block_patches)
    if pad:
        scores = jnp.pad(scores, ((0, pad), (0, 0), (0, 0)))
        log_mu = jnp.pad(log_mu, ((0, pad), (0, 0)))
        log_nu = jnp.pad(log_nu, ((0, pad), (0, 0)))
    grid = ((p + pad) // bp,)

    out = pl.pallas_call(
        functools.partial(_sinkhorn_kernel, num_iterations=num_iterations),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, k1, k1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, k1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, k1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, k1, k1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(scores.shape, jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=num_iterations * 4 * scores.size,
            bytes_accessed=2 * scores.size * 4,
            transcendentals=num_iterations * 2 * scores.size,
        ),
    )(scores.astype(jnp.float32), log_mu.astype(jnp.float32), log_nu.astype(jnp.float32))
    return out[:p]
