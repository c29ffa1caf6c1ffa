"""Microbenchmark: does a bf16 SOURCE halve neighbor-gather cost?

The kpconv pipeline casts gathered features to the compute dtype AFTER the
gather — XLA then still reads f32 rows from HBM. This measures row gathers
at the encoder's real shapes with f32 vs bf16 source arrays, plus the
maxpool (gather+max) composite, to decide whether pre-gather casts are
worth wiring into the backbone.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
    import jax

    o = fn(*args)
    _ = np.asarray(jax.tree.leaves(o)[0])
    dt = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        _ = np.asarray(jax.tree.leaves(o)[0])
        dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # (support_rows, channels, query_rows, K) at the stacked-pair encoder
    # shapes of the 0.7 bucket (21504*2 level-0 rows etc.)
    shapes = [
        ("L0 feats mid=32", 43008, 32, 43008, 40),
        ("L1 shortcut c=128", 43008, 128, 17408, 40),
        ("L2 shortcut c=256", 17408, 256, 7168, 40),
        ("L3 shortcut c=512", 7168, 512, 2560, 40),
        ("L4 shortcut c=1024", 2560, 1024, 1024, 40),
    ]
    for name, s, c, q, k in shapes:
        feats = jnp.asarray(rng.randn(s, c), jnp.float32)
        idx = jnp.asarray(rng.randint(0, s, size=(q, k)), jnp.int32)

        def gather_f32(f, i):
            return jnp.max(jnp.take(f, i, axis=0, mode="fill", fill_value=0.0), axis=1)

        def gather_bf16(f, i):
            g = jnp.take(f.astype(jnp.bfloat16), i, axis=0, mode="fill",
                         fill_value=0.0)
            return jnp.max(g, axis=1).astype(jnp.float32)

        def gather_bf16_pre(f, i):
            # source already bf16 (cast hoisted out of the timed region)
            return jnp.max(jnp.take(f, i, axis=0, mode="fill", fill_value=0.0),
                           axis=1).astype(jnp.float32)

        f16 = feats.astype(jnp.bfloat16)
        t1 = timeit(jax.jit(gather_f32), feats, idx)
        t2 = timeit(jax.jit(gather_bf16), feats, idx)
        t3 = timeit(jax.jit(gather_bf16_pre), f16, idx)
        rows = q * k
        print(
            f"{name:20s} rows={rows/1e6:5.2f}M  f32 {t1*1e3:6.2f} ms"
            f" ({t1/rows*1e9:4.1f} ns/row)   cast-in-graph {t2*1e3:6.2f} ms"
            f"   bf16-src {t3*1e3:6.2f} ms"
        )


if __name__ == "__main__":
    main()
