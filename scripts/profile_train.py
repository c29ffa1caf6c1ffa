"""Train-step performance accounting on the live device (VERDICT r3 #2).

Decomposes one production train step (the bench.py train_pipeline shape:
demo pair, 0.7 bucket, batch=1) into build / forward / backward / optimizer,
and measures the candidate optimizations the round-3 verdict asked for:
buffer donation, rematerialization policies, and a bf16 backbone under
training. Variants are selectable so runs can be interleaved with the
training queue without paying every compile at once:

    python scripts/profile_train.py --variants build,fwd,vag,step,stepnb
    python scripts/profile_train.py --variants donate,remat_dots,bf16

Timing protocol per .claude/skills/verify: repeated dispatch of the same
program + one final host fetch as the completion barrier; two reps, report
the second (first post-compile loop runs ~20x slow on the tunnel device).
Train-step variants thread state through iterations (the honest
serialization — training steps are sequential by nature).
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_VARIANTS = [
    "build",      # graph build alone (no grad)
    "fwd",        # loss fwd only, prebuilt batch
    "vag",        # value_and_grad, prebuilt batch (bwd = vag - fwd)
    "stepnb",     # full step (vag + Adam), prebuilt batch (opt = stepnb - vag)
    "step",       # full production step incl. build (bench train_pipeline)
    "donate",     # step with the state buffers donated
    "remat_dots", # step, loss rematerialized, dots-no-batch-dims saveable
    "remat_full", # step, loss fully rematerialized (nothing saveable)
    "bf16",       # step with compute_dtype=bfloat16 backbone/transformers
]


COMPILE_ONLY = False


def timeit_chained_state(step_fn, state, extra_args, iters=8, reps=2):
    """Time a (state, *args) -> (state, metrics) step, threading state."""
    import jax

    st, m = step_fn(state, *extra_args)
    _ = np.asarray(m["loss"])  # compile + warm-up barrier
    if COMPILE_ONLY:
        return float("nan")
    dt = None
    for _ in range(reps):
        t0 = time.perf_counter()
        cur = st
        for _ in range(iters):
            cur, m = step_fn(cur, *extra_args)
        _ = np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / iters
    return dt


def timeit_dispatch(fn, *args, iters=10, reps=2):
    """Time a pure function by overlapped dispatch + one final fetch."""
    import jax

    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    if COMPILE_ONLY:
        return float("nan")
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(ALL_VARIANTS))
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--compile_only", action="store_true",
        help="compile every requested variant into the persistent cache "
             "and skip the timing loops — lets the ~10 min/variant compiles "
             "overlap a running training job; re-run without this flag for "
             "clean measurements once the chip is free",
    )
    args = ap.parse_args()
    want = [v.strip() for v in args.variants.split(",") if v.strip()]
    unknown = set(want) - set(ALL_VARIANTS)
    assert not unknown, f"unknown variants {unknown}; choose from {ALL_VARIANTS}"
    global COMPILE_ONLY
    COMPILE_ONLY = args.compile_only

    import jax
    import jax.numpy as jnp

    from rdmnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.data.loader import choose_bucket
    from rdmnet_tpu.engine.train_step import (
        create_train_state,
        make_batch_loss,
    )
    from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud

    cfg = make_cfg()
    ref = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    src = np.load("/root/reference/assets/pc/000004.npy")[:, :3].astype(np.float32)
    buckets = [cfg.pyramid.scaled(0.7), cfg.pyramid]
    b = choose_bucket(max(len(ref), len(src)), [s.caps[0] for s in buckets])
    cfg = dataclasses.replace(cfg, pyramid=buckets[b])
    print(f"bucket caps: {cfg.pyramid.caps}", flush=True)

    cap = cfg.pyramid.caps[0]
    rp, rc = pad_cloud(jnp.asarray(ref), cap)
    sp, sc = pad_cloud(jnp.asarray(src), cap)
    eye = jnp.eye(4)

    build = jax.jit(lambda rp: build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid))
    batch1 = jax.tree.map(lambda x: x[None], build(rp))
    state = create_train_state(
        cfg, jax.random.PRNGKey(1),
        jax.tree.map(lambda x: x[0], batch1), steps_per_epoch=100,
    )
    key = jax.random.PRNGKey(2)
    batch_loss = make_batch_loss(cfg)
    results = {}

    def report(name, dt, note=""):
        results[name] = dt
        print(f"{name:12s}: {dt * 1e3:8.2f} ms  {note}", flush=True)

    if "build" in want:
        report("build", timeit_dispatch(build, rp, iters=args.iters))

    if "fwd" in want:
        fwd = jax.jit(
            lambda p, b, k: batch_loss(p, state.apply_fn, b, k)[0]
        )
        report("fwd", timeit_dispatch(fwd, state.params, batch1, key,
                                      iters=args.iters))

    if "vag" in want:
        vag = jax.jit(
            lambda p, b, k: jax.value_and_grad(
                lambda q: batch_loss(q, state.apply_fn, b, k)[0]
            )(p)[1]
        )
        report("vag", timeit_dispatch(vag, state.params, batch1, key,
                                      iters=args.iters))

    def full_step(state, b, key):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: batch_loss(p, state.apply_fn, b, key), has_aux=True
        )(state.params)
        return state.apply_gradients(grads=grads), metrics

    if "stepnb" in want:
        report("stepnb",
               timeit_chained_state(jax.jit(full_step), state, (batch1, key),
                                    iters=args.iters))

    def pipeline_step(state, rp, key):
        b = jax.tree.map(
            lambda x: x[None], build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid)
        )
        return full_step(state, b, key)

    if "step" in want:
        report("step",
               timeit_chained_state(jax.jit(pipeline_step), state, (rp, key),
                                    iters=args.iters),
               "(production: build + fwd + bwd + Adam)")

    if "donate" in want:
        # state buffers donated: params/opt-state updates reuse the input
        # HBM allocations instead of writing fresh ones
        donated = jax.jit(pipeline_step, donate_argnums=0)
        report("donate",
               timeit_chained_state(donated, state, (rp, key),
                                    iters=args.iters))

    for name, policy_name in [
        ("remat_dots", "dots_with_no_batch_dims_saveable"),
        ("remat_full", "nothing_saveable"),
    ]:
        if name not in want:
            continue
        policy = getattr(jax.checkpoint_policies, policy_name)

        def remat_step(state, rp, key, _policy=policy):
            b = jax.tree.map(
                lambda x: x[None],
                build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid),
            )
            loss_fn = jax.checkpoint(
                lambda p: batch_loss(p, state.apply_fn, b, key),
                policy=_policy,
            )
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads=grads), metrics

        report(name,
               timeit_chained_state(jax.jit(remat_step), state, (rp, key),
                                    iters=args.iters),
               f"(policy={policy_name})")

    if "bf16" in want:
        bcfg = cfg.replace(compute_dtype="bfloat16")
        bf_loss = make_batch_loss(bcfg)
        from rdmnet_tpu.models import RDMNet

        bf_apply = RDMNet(bcfg).apply  # same param tree, bf16 compute

        def bf_step(state, rp, key):
            b = jax.tree.map(
                lambda x: x[None],
                build_pair_batch(rp, rc, sp, sc, eye, bcfg.pyramid),
            )
            (_, metrics), grads = jax.value_and_grad(
                lambda p: bf_loss(p, bf_apply, b, key), has_aux=True
            )(state.params)
            return state.apply_gradients(grads=grads), metrics

        report("bf16",
               timeit_chained_state(jax.jit(bf_step), state, (rp, key),
                                    iters=args.iters))

    if {"fwd", "vag"} <= results.keys():
        print(f"-> backward = vag - fwd = "
              f"{(results['vag'] - results['fwd']) * 1e3:.2f} ms")
    if {"vag", "stepnb"} <= results.keys():
        print(f"-> optimizer = stepnb - vag = "
              f"{(results['stepnb'] - results['vag']) * 1e3:.2f} ms")
    if {"build", "stepnb", "step"} <= results.keys():
        print(f"-> build overlap in fused step = stepnb + build - step = "
              f"{(results['stepnb'] + results['build'] - results['step']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
