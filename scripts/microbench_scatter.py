"""Microbench: the KPConv gather's BACKWARD (scatter-add) vs alternatives.

The inference pipeline is at the XLA row-gather floor (DESIGN.md), but the
TRAINING step also pays the gather transpose: grad_support = scatter-add of
(M*H, C) cotangent rows into the (N, C) support array. This measures, at
level-0/1 training shapes:

  1. forward gather (floor reference point)
  2. XLA native VJP of the gather (scatter-add)
  3. sort-free segment_sum over PRE-SORTED flattened indices (the neighbor
     table is static within a step, so the sort/permutation could be built
     once per step and reused by every block sharing the table); the
     cotangent permutation itself is a row gather, so this path costs
     gather + sorted-segment-sum
  4. same but with the permutation gather included (the honest cost)

Run on the live TPU: python scripts/microbench_scatter.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, reps=2):
    import jax

    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    dt = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        _ = np.asarray(jax.tree.leaves(o)[0])
        dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rdmnet_tpu.ops.geometry import take_padded

    rng = np.random.RandomState(0)

    for (n, m, h, c) in [
        (30720, 30720, 40, 16),   # level-0 residual bottleneck (mid=16)
        (30720, 12288, 40, 32),   # strided level-0->1 (mid=32)
        (12288, 12288, 40, 32),   # level-1 residual
        (5120, 5120, 40, 64),     # level-2
    ]:
        # realistic: ~93% valid indices, clustered (banded) order
        idx = np.minimum(
            (np.arange(m)[:, None] * (n / m) + rng.randint(-200, 200, (m, h))),
            n - 1,
        ).clip(0)
        idx = np.where(rng.rand(m, h) < 0.07, n, idx).astype(np.int32)
        idx = jnp.asarray(idx)
        x = jnp.asarray(rng.rand(n, c).astype(np.float32))
        ct = jnp.asarray(rng.rand(m, h, c).astype(np.float32))

        # reduce to (C,) inside the jit: fetching the raw (M, H, C) output
        # over the device tunnel would dominate the timing. The reduction
        # may let XLA fuse away some materialization, so treat the fwd
        # column as a lower bound (the known floor is ~4 ns/row + ~30 GB/s).
        fwd = jax.jit(lambda x, idx: take_padded(x, idx).sum(axis=(0, 1)))

        def vjp_bwd(x, idx, ct):
            _, pull = jax.vjp(lambda x: take_padded(x, idx), x)
            return pull(ct)[0]

        vjp_bwd = jax.jit(vjp_bwd, static_argnums=())

        # pre-sorted segment-sum path: permutation computed OUTSIDE timing
        flat = np.asarray(idx).reshape(-1)
        perm = jnp.asarray(np.argsort(flat, kind="stable").astype(np.int32))
        sorted_ids = jnp.asarray(np.sort(flat).astype(np.int32))

        @jax.jit
        def seg_bwd(ct, perm, sorted_ids):
            rows = ct.reshape(-1, ct.shape[-1])[perm]  # row gather
            return jax.ops.segment_sum(
                rows, sorted_ids, num_segments=n + 1, indices_are_sorted=True
            )[:n]

        @jax.jit
        def seg_bwd_presorted(rows, sorted_ids):
            return jax.ops.segment_sum(
                rows, sorted_ids, num_segments=n + 1, indices_are_sorted=True
            )[:n]

        rows_sorted = jnp.asarray(np.asarray(ct).reshape(-1, c)[np.asarray(perm)])

        t_fwd = timeit(fwd, x, idx)
        t_vjp = timeit(vjp_bwd, x, idx, ct)
        t_seg = timeit(seg_bwd, ct, perm, sorted_ids)
        t_seg_p = timeit(seg_bwd_presorted, rows_sorted, sorted_ids)
        print(
            f"N={n:6d} M={m:6d} H={h} C={c:3d}: "
            f"fwd {t_fwd*1e3:7.2f} ms | scatter-VJP {t_vjp*1e3:7.2f} ms | "
            f"perm+segsum {t_seg*1e3:7.2f} ms | segsum-only {t_seg_p*1e3:7.2f} ms"
        )


if __name__ == "__main__":
    main()
