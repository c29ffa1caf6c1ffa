"""On-chip learning-loop demonstration: overfit one synthetic rigid pair.

Trains the full-size model (forward + all 7 exact-parity loss terms +
backward + Adam) from random init on ONE demo-scan pair related by a known
rigid transform, then runs the full inference pipeline (vote + NMS + OT +
LGR) and reports RRE/RTE/RR vs the known pose. Round-1 reached RR=1.0 by
step 600; this re-validates the loop after the round-2 loss/backbone
changes (stacked-pair GroupNorm, exact gap-loss pairing).
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument(
        "--coarse_module", default=None,
        choices=["thdroformer", "geotransformer", "ape"],
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.engine.train_step import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud
    from rdmnet_tpu.losses.evaluator import isotropic_transform_error

    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg,
        pyramid=cfg.pyramid.scaled(0.7),
        optim=dataclasses.replace(cfg.optim, lr=args.lr, grad_acc_steps=1),
    )
    if args.coarse_module is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, coarse_module=args.coarse_module)
        )

    ref = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    rng = np.random.RandomState(0)
    angle = np.deg2rad(104.0)
    axis = np.array([0.2, -0.1, 1.0])
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    R = (np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)).astype(np.float32)
    t = np.array([3.0, -2.0, 0.5], np.float32)
    tf_gt = np.eye(4, dtype=np.float32)
    tf_gt[:3, :3] = R
    tf_gt[:3, 3] = t
    src = ((ref - t) @ R).astype(np.float32) + rng.randn(*ref.shape).astype(np.float32) * 0.02

    cap = cfg.pyramid.caps[0]
    rp, rc = pad_cloud(jnp.asarray(ref), cap)
    sp, sc = pad_cloud(jnp.asarray(src), cap)

    build = jax.jit(lambda: build_pair_batch(rp, rc, sp, sc, jnp.asarray(tf_gt), cfg.pyramid))
    batch1 = jax.tree.map(lambda x: x[None], build())  # leading batch axis

    state = create_train_state(cfg, jax.random.PRNGKey(0), jax.tree.map(lambda x: x[0], batch1))
    step = make_train_step(cfg)
    eval_step = make_eval_step(cfg)

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(1, args.steps + 1):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch1, sub)
        if i % args.log_every == 0 or i == 1:
            m = {k: float(v) for k, v in metrics.items()}
            ev, tfs = eval_step(state, batch1)
            rre, rte = isotropic_transform_error(jnp.asarray(tf_gt), tfs[0])
            print(
                f"step {i:4d} | loss {m['loss']:.4f} c {m['c_loss']:.3f} "
                f"g {m['g_loss']:.3f} | PIR {float(ev['PIR']):.3f} "
                f"IR {float(ev['IR']):.3f} RR {float(ev['RR']):.0f} "
                f"RRE {float(rre):.2f}deg RTE {float(rte):.3f}m "
                f"| {(time.perf_counter()-t0)/i*1e3:.0f} ms/step"
            )
    ev, tfs = eval_step(state, batch1)
    rre, rte = isotropic_transform_error(jnp.asarray(tf_gt), tfs[0])
    print(
        f"FINAL: RR {float(ev['RR']):.0f} RRE {float(rre):.3f} deg "
        f"RTE {float(rte):.4f} m IR {float(ev['IR']):.3f}"
    )


if __name__ == "__main__":
    main()
