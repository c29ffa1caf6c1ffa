"""Fused radius-bounded kNN as a Pallas TPU kernel.

The jnp implementation (rdmnet_tpu/ops/radius_search.py) materializes each
(q_chunk, S) distance tile in HBM before the top-k reduction — ~7.5 GB of
HBM round-trip per 30k x 30k search. This kernel computes each distance
tile in VMEM and folds it immediately into a running per-query top-k that
never leaves the chip: HBM traffic = read points once + write (Q, K) indices.

Grid: (num_q_tiles, num_s_blocks); the output block depends only on the
query tile, so the running top-k accumulates across the s-block dimension
(standard revisited-output pattern). Per s-block the merge concatenates the
carried top-K with the fresh block scores and re-extracts K maxima by
K-step argmax peeling (K is small: the calibrated neighbor limit).

Results match the exact top_k path: per query, the K nearest in-radius
support points in ascending distance order, sentinel-padded.

MEASURED (TPU v5e, 30720x30720, K=40): 188-254 ms vs 12 ms for the
jnp + approx_max_k path — the K-step argmax peeling is VPU-bound and loses
badly to XLA's PartialReduce. Kept as the EXACT-search option (the exact
jnp top_k path costs ~180 ms at this size and the approx path trades ~5%
tail-neighbor recall); not used by the default pyramid builder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e12


def _kernel(q_ref, s_ref, s_sq_ref, svalid_ref, out_idx_ref, vals_ref,
            idx_ref, *, k, radius_sq, s_cap, block_s):
    j = pl.program_id(1)
    num_s_blocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        vals_ref[:] = jnp.full_like(vals_ref, -_BIG)
        idx_ref[:] = jnp.full_like(idx_ref, s_cap)

    q = q_ref[:]                       # (TQ, 3)
    s = s_ref[:]                       # (BS, 3)
    # HIGHEST: the default bf16 MXU pass flips neighbor orderings near the
    # radius boundary — this kernel's contract is EXACT top-k (the same
    # reason ops/radius_search.py pins its distance matmul precision)
    qs = jnp.dot(q, s.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # (TQ, BS)
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    d = jnp.maximum(q_sq - 2.0 * qs + s_sq_ref[:][None, :], 0.0)
    ok = (d <= radius_sq) & (svalid_ref[:][None, :] > 0)
    neg = jnp.where(ok, -d, -_BIG)     # maximize -distance

    tq, bs = neg.shape
    base = j * block_s
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, (tq, bs), 1)

    cand_vals = jnp.concatenate([vals_ref[:], neg], axis=1)        # (TQ, K+BS)
    cand_idx = jnp.concatenate([idx_ref[:], col_ids], axis=1)

    def peel(t, carry):
        cv, ci, tv, ti = carry
        m = jnp.max(cv, axis=1)                                     # (TQ,)
        am = jnp.argmax(cv, axis=1)                                 # (TQ,)
        width = cv.shape[1]
        hit = jax.lax.broadcasted_iota(jnp.int32, (tq, width), 1) == am[:, None]
        # masked-max instead of gather (Mosaic cannot lower row gathers)
        sel = jnp.max(jnp.where(hit, ci, -1), axis=1)
        # masked column write instead of dynamic_update_slice (unlowereable)
        slot = jax.lax.broadcasted_iota(jnp.int32, tv.shape, 1) == t
        tv = jnp.where(slot, m[:, None], tv)
        ti = jnp.where(slot, sel[:, None], ti)
        cv = jnp.where(hit, -_BIG, cv)
        return cv, ci, tv, ti

    tv0 = jnp.full((tq, k), -_BIG, jnp.float32)
    ti0 = jnp.full((tq, k), s_cap, jnp.int32)
    _, _, tv, ti = jax.lax.fori_loop(0, k, peel, (cand_vals, cand_idx, tv0, ti0))

    vals_ref[:] = tv
    idx_ref[:] = ti

    @pl.when(j == num_s_blocks - 1)
    def _():
        out_idx_ref[:] = jnp.where(tv <= -_BIG, s_cap, ti).astype(jnp.int32)


def radius_knn_pallas(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    s_count: jnp.ndarray,
    radius: float,
    k: int,
    tile_q: int = 256,
    block_s: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused variant of rdmnet_tpu.ops.radius_search.radius_knn
    (exact top-k semantics). Requires k <= block_s."""
    q, s = q_points.shape[0], s_points.shape[0]
    pad_q = (-q) % tile_q
    pad_s = (-s) % block_s
    qp = jnp.pad(q_points, ((0, pad_q), (0, 0)), constant_values=1e9)
    sp = jnp.pad(s_points, ((0, pad_s), (0, 0)), constant_values=1e9)
    s_sq = jnp.sum(sp * sp, axis=-1)
    svalid = (jnp.arange(s + pad_s, dtype=jnp.int32) < s_count).astype(jnp.int32)

    grid = ((q + pad_q) // tile_q, (s + pad_s) // block_s)
    out = pl.pallas_call(
        functools.partial(
            _kernel, k=k, radius_sq=float(radius) ** 2, s_cap=s, block_s=block_s
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s,), lambda i, j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s,), lambda i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q + pad_q, k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.float32),
            pltpu.VMEM((tile_q, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (q + pad_q) * (s + pad_s) * 3
            + (q + pad_q) * (s + pad_s) * k // block_s * 4,
            bytes_accessed=(q + pad_q) * (3 * 4 + k * 4) + (s + pad_s) * 16,
            transcendentals=0,
        ),
    )(qp, sp, s_sq, svalid)
    return out[:q]
